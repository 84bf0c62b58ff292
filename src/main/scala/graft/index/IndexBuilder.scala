package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.functions.{Analyzer, Codec, DenseId}
import graft.sources.HtmlText

/** Spark-native inverted-index build (north rule): the replacement for the
  * reference's "export to Elasticsearch and let ES index" role
  * (`ElasticSearchStorage.cs:95-149`) — we build the postings ourselves.
  *
  * Dataflow (≙ the reference ingest pipeline, SURVEY.md §3.1, rendered
  * Spark-first):
  *
  *   pages scan → extract(html)→text [per-row invariant] → analyze
  *   (tokenize+tf, one map-side pass) → deterministic dense docID
  *   (two-pass, parallelism-independent) → stage analyzed docs to parquet
  *   partitioned by shuffle group [checkpoint ≙ T5] → per group:
  *   shuffle by (term, slice) [slice = doc-range salt: hot-term skew
  *   split] → sortWithinPartitions(term, slice, doc_id) → mapPartitions
  *   block-encode (delta+varbyte, per-block max-impact) → partitioned
  *   write + metrics + checkpoint append.
  *
  * Every stage is deterministic given (corpus, nGroups, nSlices,
  * blockSize) — resume after a kill reproduces a byte-identical index
  * (≙ T6 "effectively exactly-once").
  *
  * Scale notes (100 TB / 10^12 docs):
  *   - no driver-side data paths except tiny per-partition count arrays;
  *   - the analyzed staging table is the only extra I/O, and it is what
  *     buys group-level resumability (bounded failure domain — the same
  *     trade the reference makes with sink-stored checkpoints);
  *   - the hottest term is split over nSlices doc-range slices, so the
  *     max shuffle-partition payload is O(nDocs/nSlices), not O(nDocs);
  *   - group jobs read the staging table with partition pruning
  *     (`grp=g`), so each group touches 1/nGroups of the staged bytes.
  */
object IndexBuilder {

  val K1 = 1.2
  val B = 0.75

  final case class BuildConfig(
      nPartitions: Int = 32,
      nGroups: Int = 4,
      nSlices: Int = 16,
      blockSize: Int = 128
  )

  // ---- checkpoint manifest (JSONL, append-only; ≙ EventLogPosition) ----
  def ckptPath(indexDir: String) = Paths.get(indexDir, "checkpoints.jsonl")

  def completedUnits(indexDir: String): Set[String] = {
    val p = ckptPath(indexDir)
    if (!Files.exists(p)) Set.empty
    else
      scala.jdk.CollectionConverters
        .IteratorHasAsScala(Files.lines(p).iterator()).asScala
        .flatMap { line =>
          val m = """"unit"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(line)
          m.map(_.group(1))
        }
        .toSet
  }

  private def commitUnit(indexDir: String, unit: String): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    Files.write(
      ckptPath(indexDir),
      s"""{"unit":"$unit"}\n""".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE,
      StandardOpenOption.APPEND
    )
  }

  /** BM25 impact of one posting (multiply by idf for the score term). */
  @inline def impact(tf: Int, dl: Int, avgDl: Double): Double =
    tf / (tf + K1 * (1 - B + B * dl / avgDl))

  /** Build (or resume building) the index for `pages` into `indexDir`.
    * `failAfterGroups`: test hook — throw after committing that many
    * posting groups (resumability test, FIXTURES.md §4).
    */
  def build(
      spark: SparkSession,
      pages: Dataset[Page],
      indexDir: String,
      cfg: BuildConfig = BuildConfig(),
      failAfterGroups: Int = Int.MaxValue
  ): Unit = {
    import spark.implicits._
    val done = completedUnits(indexDir)
    if (done.contains("done")) return

    // ---- stage 1: analyze + docID assignment + staging ----------------
    if (!done.contains("staged")) {
      // extract text from html (per-row invariant: byte-identical to the
      // stored text column — enforced here, not assumed) and analyze once.
      val analyzedNoId = pages.mapPartitions { it =>
        it.map { p =>
          val extracted = HtmlText.extract(p.html)
          require(
            extracted == p.text,
            s"extract invariant violated for ${p.url}"
          )
          val (dl, tfs) = Analyzer.termFreqs(extracted)
          (p.url, p.warc_ts, p.lang, dl, tfs.toMap)
        }
      }.toDF("url", "warc_ts", "lang", "doc_len", "tfs")

      val withIds = DenseId.assign(analyzedNoId, "url", "doc_id", cfg.nPartitions)

      // docs table, clustered by doc_id (≙ ClickHouse ORDER BY clustering,
      // `ClickHouseStorage.cs:181`)
      withIds
        .select($"doc_id", $"url", $"warc_ts", $"lang", $"doc_len")
        .repartitionByRange(cfg.nPartitions, $"doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/docs")

      // corpus stats (avg_dl over all docs, N = all docs)
      val stats = spark.read.parquet(s"$indexDir/docs")
        .agg(
          count(lit(1)).as("n_docs"),
          coalesce(avg($"doc_len"), lit(0.0)).as("avg_dl"),
          coalesce(sum($"doc_len"), lit(0L)).as("total_tokens")
        )
      stats.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
      val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
      val nDocs = math.max(1L, st.n_docs)

      // staged term-docs, partitioned by shuffle group for pruned resume
      val nSlices = cfg.nSlices
      val nGroups = cfg.nGroups
      withIds
        .select($"doc_id", $"doc_len", explode($"tfs").as(Seq("term", "tf")))
        .withColumn(
          "slice",
          least(
            lit(nSlices - 1),
            ($"doc_id" * nSlices / nDocs).cast("int")
          )
        )
        .withColumn("grp", pmod(xxhash64($"term", $"slice"), lit(nGroups)).cast("int"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("grp")
        .parquet(s"$indexDir/staged")
      commitUnit(indexDir, "staged")
    }

    val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
    val avgDl = if (st.avg_dl > 0) st.avg_dl else 1.0

    // ---- stage 2: term dictionary (df per term) ------------------------
    if (!completedUnits(indexDir).contains("terms")) {
      spark.read.parquet(s"$indexDir/staged")
        .groupBy($"term")
        .agg(count(lit(1)).as("doc_freq"), sum($"tf").as("total_tf"))
        .repartitionByRange(cfg.nPartitions, $"term")
        .sortWithinPartitions("term")
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/terms")
      commitUnit(indexDir, "terms")
    }

    // ---- stage 3: posting groups (resumable unit = one group) ---------
    val blockSize = cfg.blockSize
    var groupsBuilt = 0
    (0 until cfg.nGroups).foreach { g =>
      val unit = s"grp-$g"
      if (!completedUnits(indexDir).contains(unit)) {
        if (groupsBuilt >= failAfterGroups)
          throw new RuntimeException(s"injected failure before $unit")
        val staged = spark.read.parquet(s"$indexDir/staged")
          .where($"grp" === g) // partition pruning on the staging table
        val partsPerGroup = math.max(1, cfg.nPartitions / cfg.nGroups)
        val blocks = staged
          .repartition(partsPerGroup, $"term", $"slice")
          .sortWithinPartitions("term", "slice", "doc_id")
          .select($"term", $"slice", $"doc_id", $"tf", $"doc_len")
          .as[(String, Int, Long, Int, Int)]
          .mapPartitions { it =>
            blockify(it, g, blockSize, avgDl)
          }
        // `grp` comes back as the directory partition column on read
        blocks.drop("grp")
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/postings/grp=$g")

        // per-partition build metrics (lineage; ≙ build_metrics table)
        val m = spark.read.parquet(s"$indexDir/postings/grp=$g")
          .withColumn("pid", spark_partition_id())
          .groupBy($"pid")
          .agg(
            countDistinct($"term").as("terms"),
            sum($"count").cast("long").as("postings"),
            count(lit(1)).as("blocks"),
            sum(length($"deltas") + length($"tfs") + length($"dls"))
              .cast("long").as("bytes")
          )
          .select(
            $"pid".as("partition_id"), $"terms",
            $"postings", $"blocks", $"bytes", lit("committed").as("status")
          )
        m.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$indexDir/build_metrics/grp=$g")
        commitUnit(indexDir, unit)
        groupsBuilt += 1
      }
    }

    commitUnit(indexDir, "done")
  }

  /** Encode one sorted partition iterator into posting blocks.
    * Input rows sorted by (term, slice, doc_id); consecutive runs of the
    * same (term, slice) become one posting sub-list, chunked into blocks.
    */
  def blockify(
      it: Iterator[(String, Int, Long, Int, Int)],
      grp: Int,
      blockSize: Int,
      avgDl: Double
  ): Iterator[PostingRow] = {
    val in = it.buffered
    new Iterator[PostingRow] {
      private var curTerm: String = _
      private var curSlice: Int = -1
      private var blockId: Int = 0
      def hasNext: Boolean = in.hasNext
      def next(): PostingRow = {
        val (term, slice, _, _, _) = in.head
        if (term != curTerm || slice != curSlice) {
          curTerm = term; curSlice = slice; blockId = 0
        }
        val ids = new ArrayBuffer[Long](blockSize)
        val tfs = new ArrayBuffer[Int](blockSize)
        val dls = new ArrayBuffer[Int](blockSize)
        var maxImpact = 0.0
        while (
          in.hasNext && ids.length < blockSize && {
            val h = in.head; h._1 == term && h._2 == slice
          }
        ) {
          val (_, _, docId, tf, dl) = in.next()
          ids += docId; tfs += tf; dls += dl
          val imp = impact(tf, dl, avgDl)
          if (imp > maxImpact) maxImpact = imp
        }
        val row = PostingRow(
          grp, slice, term, blockId,
          ids.head, ids.last, ids.length,
          Codec.encodeDeltas(ids.toArray),
          Codec.encodeInts(tfs.toArray),
          Codec.encodeInts(dls.toArray),
          maxImpact
        )
        blockId += 1
        row
      }
    }
  }

  // ---- readers --------------------------------------------------------
  def readDocs(spark: SparkSession, indexDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/docs").as[Doc]
  }
  def readStats(spark: SparkSession, indexDir: String): CorpusStats = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
  }
  def readTerms(spark: SparkSession, indexDir: String): Dataset[TermStat] = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/terms").as[TermStat]
  }
  def readPostings(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.option("basePath", s"$indexDir/postings")
      .parquet(s"$indexDir/postings")
  def readMetrics(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.option("basePath", s"$indexDir/build_metrics")
      .parquet(s"$indexDir/build_metrics")
}
