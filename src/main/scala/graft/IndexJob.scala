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
  *   build  <pages.parquet> <indexDir> [--partitions=N] [--groups=N] [--slices=N] [--block=N]
  *   merge  <indexA> <indexB> <outDir>  [same flags]
  *   search <indexDir> <and|or> <k> term [term ...]
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

  private def cfg(args: Seq[String]): BuildConfig = BuildConfig(
    nPartitions = flag(args, "partitions", 32),
    nGroups = flag(args, "groups", 4),
    nSlices = flag(args, "slices", 16),
    blockSize = flag(args, "block", 128)
  )

  def run(spark: SparkSession, args: Seq[String]): Unit = {
    import spark.implicits._
    val positional = args.drop(1).filterNot(_.startsWith("--"))
    args.headOption match {
      case Some("build") =>
        val Seq(pagesPath, indexDir) = positional.take(2)
        val pages = spark.read.parquet(pagesPath).as[Page]
        IndexBuilder.build(spark, pages, indexDir, cfg(args))
      case Some("merge") =>
        val Seq(idxA, idxB, outDir) = positional.take(3)
        SegmentMerge.merge(spark, idxA, idxB, outDir, cfg(args))
      case Some("search") =>
        val Seq(indexDir, mode, k) = positional.take(3)
        val terms = positional.drop(3)
        Search.topK(spark, indexDir, terms, mode, k.toInt)
          .collect()
          .foreach(r => println(s"${r.getLong(0)}\t${r.getDouble(1)}"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown command $other; expected build|merge|search"
        )
    }
  }
}
