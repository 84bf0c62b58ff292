package graft

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, SegmentMerge}
import graft.index.IndexBuilder.BuildConfig
import graft.query.Search

/** The spark-submit entry point (north rule: "runs via spark-submit on
  * multi-executor clusters") — the operational analog of the reference's
  * service host (`OneSTools.EventLog.Exporter/Program.cs:15-18`): one
  * binary that builds (or resumes) an index from a pages table, merges
  * segments, or answers a query.
  *
  * {{{
  * spark-submit --class graft.IndexJob graft.jar \
  *   build      <pages.parquet> <indexDir> [--partitions=N] [--groups=N] [--slices=N] [--block=N] [--positions=0]
  *   build-time <pages.parquet> <rootDir>  [same flags]     # one segment per month(warc_ts)
  *   merge      <indexA> <indexB> <outDir> [same flags]     # byte-identical rebuild merge
  *   fastmerge  <outDir> <indexA> <indexB> [<indexC> ...]   # decode-free stacked merge
  *   search     <indexDir> <and|or> <k> term [term ...] [--lang=xx] [--from=ISO_TS] [--to=ISO_TS]
  *   phrase     <indexDir> <k> term [term ...]
  *   search-segments <k> <and|or> <terms,comma-sep> <segDir> [<segDir> ...]
  * }}}
  *
  * No `master` is set here — spark-submit / the cluster manager owns it;
  * tests call [[run]] with their own local session. Build resume is
  * automatic: re-submitting the same build command continues from the
  * per-partition checkpoint manifest (≙ the reference's sink-stored
  * position resume, `EventLogExporter.cs:192-241`).
  */
object IndexJob {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName(s"graft-${args.headOption.getOrElse("job")}")
      .getOrCreate()
    try run(spark, args.toIndexedSeq)
    finally spark.stop()
  }

  private def flag(args: Seq[String], name: String, default: Int): Int =
    args.collectFirst { case s if s.startsWith(s"--$name=") => s.drop(name.length + 3).toInt }
      .getOrElse(default)

  private def strFlag(args: Seq[String], name: String): Option[String] =
    args.collectFirst { case s if s.startsWith(s"--$name=") => s.drop(name.length + 3) }

  private def cfg(args: Seq[String]): BuildConfig = BuildConfig(
    nPartitions = flag(args, "partitions", 32),
    nGroups = flag(args, "groups", 4),
    nSlices = flag(args, "slices", 16),
    blockSize = flag(args, "block", 128),
    positions = flag(args, "positions", 1) != 0,
    mapSideCombine = flag(args, "combine", 0) != 0
  )

  def run(spark: SparkSession, args: Seq[String]): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val positional = args.drop(1).filterNot(_.startsWith("--"))
    def printHits(df: org.apache.spark.sql.DataFrame): Unit =
      df.collect().foreach(r => println(s"${r.getLong(0)}\t${r.getDouble(1)}"))
    args.headOption match {
      case Some("build") =>
        val Seq(pagesPath, indexDir) = positional.take(2)
        val pages = spark.read.parquet(pagesPath).as[Page]
        IndexBuilder.build(spark, pages, indexDir, cfg(args))
      case Some("build-time") =>
        val Seq(pagesPath, rootDir) = positional.take(2)
        val pages = spark.read.parquet(pagesPath).as[Page]
        graft.index.TimeBuckets.build(spark, pages, rootDir, cfg(args))
          .foreach(b => println(s"${b.bucket}\t${b.dir}\t${b.n_docs}"))
      case Some("merge") =>
        val Seq(idxA, idxB, outDir) = positional.take(3)
        SegmentMerge.merge(spark, idxA, idxB, outDir, cfg(args))
      case Some("fastmerge") =>
        val outDir = positional.head
        SegmentMerge.fastMerge(spark, positional.tail, outDir)
      case Some("search") =>
        val Seq(indexDir, mode, k) = positional.take(3)
        val terms = positional.drop(3)
        // keyword/date predicates compose into one ES-filter-context filter
        val preds = Seq(
          strFlag(args, "lang").map(l => col("lang") === l),
          strFlag(args, "from").map(f => col("warc_ts") >= lit(f).cast("timestamp")),
          strFlag(args, "to").map(t => col("warc_ts") < lit(t).cast("timestamp"))
        ).flatten
        val docFilter = preds.reduceOption(_ && _).orNull
        printHits(Search.topK(spark, indexDir, terms, mode, k.toInt, docFilter))
      case Some("phrase") =>
        val Seq(indexDir, k) = positional.take(2)
        printHits(Search.phraseTopK(spark, indexDir, positional.drop(2), k.toInt))
      case Some("search-segments") =>
        val Seq(k, mode, termsCsv) = positional.take(3)
        val segs = positional.drop(3)
        printHits(new graft.query.MultiSearcher(spark, segs)
          .topK(termsCsv.split(",").toSeq, mode, k.toInt))
      case other =>
        throw new IllegalArgumentException(
          s"unknown command $other; expected build|build-time|merge|fastmerge|search|phrase|search-segments"
        )
    }
  }
}
