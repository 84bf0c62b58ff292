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

  /** `positions`: index token positions (phrase queries) — on by default,
    * matching ES text-field defaults the reference provisions.
    */
  final case class BuildConfig(
      nPartitions: Int = 32,
      nGroups: Int = 4,
      nSlices: Int = 16,
      blockSize: Int = 128,
      positions: Boolean = true
  )

  /** Persisted index metadata (≙ the ES index-template the reference
    * installs once, `ElasticSearchStorage.cs:187-243`): layout constants a
    * searcher needs without re-deriving them from data.
    */
  def writeMeta(indexDir: String, cfg: BuildConfig): Unit = {
    Files.createDirectories(Paths.get(indexDir))
    Files.write(
      Paths.get(indexDir, "meta.json"),
      s"""{"n_groups":${cfg.nGroups},"n_slices":${cfg.nSlices},"block_size":${cfg.blockSize},"positions":${cfg.positions}}""".getBytes(StandardCharsets.UTF_8)
    )
  }

  def readMeta(indexDir: String): BuildConfig = {
    val p = Paths.get(indexDir, "meta.json")
    if (!Files.exists(p)) return BuildConfig()
    val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    def num(k: String) = s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(s).map(_.group(1).toInt)
    BuildConfig(
      nGroups = num("n_groups").getOrElse(4),
      nSlices = num("n_slices").getOrElse(16),
      blockSize = num("block_size").getOrElse(128),
      positions = s.contains(""""positions":true""")
    )
  }

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

  private[index] def commitUnitPublic(indexDir: String, unit: String): Unit =
    commitUnit(indexDir, unit)

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

  /** Test-only chaos hook: when set, the first posting-write task to
    * produce a block dies mid-iteration (after partial local metrics
    * state) — its retry must yield exact, not double-counted, metrics.
    * Local-mode only (same JVM); a no-op in production.
    */
  private[graft] val chaosOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private val verbose = sys.env.contains("GRAFT_BUILD_VERBOSE")
  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (verbose)
      System.err.println(f"[build] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

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
    require(cfg.nSlices % cfg.nGroups == 0, "nSlices must be a multiple of nGroups")
    val done = completedUnits(indexDir)
    if (done.contains("done")) return
    writeMeta(indexDir, cfg)

    // ---- stage 1: docID assignment + fused docs/text staging ----------
    // ONE table `docs` holds (doc_id, url, warc_ts, lang, doc_len, text),
    // partitioned by doc-range group, written in a single pass:
    //   - dimension readers (query side) column-prune `text` away — the
    //     parquet scan never touches the big column (ReadSchema without
    //     text; verified via explain in tests);
    //   - group jobs read (doc_id, text) of their own grp partition only
    //     (partition pruning) and re-tokenize — the resume checkpoint.
    // Raw text is stored exactly once — an exploded term-row staging
    // table would repeat the term string per posting and cost ~2-3x.
    if (!done.contains("staged")) {
      // extract text from html (per-row invariant: byte-identical to the
      // stored text column — enforced here, not assumed); html dropped
      // BEFORE the dense-id shuffle so the exchange never carries it.
      val prepared = pages.mapPartitions { it =>
        it.map { p =>
          val extracted = HtmlText.extract(p.html)
          require(extracted == p.text, s"extract invariant violated for ${p.url}")
          (p.url, p.warc_ts, p.lang, extracted)
        }
      }.toDF("url", "warc_ts", "lang", "text")

      val (withIds, total) =
        timed("dense-id")(DenseId.assignWithCount(prepared, "url", "doc_id", cfg.nPartitions))
      val nDocs = math.max(1L, total)

      // corpus token total rides the write job as an accumulator instead
      // of a separate scan-the-docs-table job afterwards. Accumulator
      // updates inside an action are applied exactly once per successful
      // task, so retried tasks cannot double-count (stats feed BM25 —
      // they must be exact). doc_len uses the count-only tokenizer: same
      // state machine as tokenize() but no token-string allocations.
      val tokenAcc = spark.sparkContext.longAccumulator("graft.total_tokens")
      timed("docs-write")(withIds
        .select($"doc_id", $"url", $"warc_ts", $"lang", $"text")
        .as[(Long, String, java.sql.Timestamp, String, String)]
        .map { case (id, url, ts, lang, text) =>
          val dl = Analyzer.tokenCount(text)
          tokenAcc.add(dl.toLong)
          (id, url, ts, lang, dl, text)
        }
        .toDF("doc_id", "url", "warc_ts", "lang", "doc_len", "text")
        // slice is materialized on the docs row so filtered search can ship
        // doc-filter sets to the right WAND task by equi-key, decoupled
        // from the id→slice formula (fast-merged indexes renumber slices)
        .withColumn("slice", least(lit(cfg.nSlices - 1), ($"doc_id" * cfg.nSlices / nDocs).cast("int")))
        .withColumn("grp", least(lit(cfg.nGroups - 1), ($"doc_id" * cfg.nGroups / nDocs).cast("int")))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("grp")
        .parquet(s"$indexDir/docs"))

      val totalTokens = tokenAcc.value.longValue()
      val avgDl = if (total > 0) totalTokens.toDouble / total else 0.0
      timed("stats")(Seq(CorpusStats(total, avgDl, totalTokens)).toDS()
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats"))
      commitUnit(indexDir, "staged")
    }

    val nDocs = math.max(1L, spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head().n_docs)
    val nSlices = cfg.nSlices
    val withPos = cfg.positions
    val groupInput: Int => DataFrame = { g =>
      spark.read.parquet(s"$indexDir/docs")
        .where($"grp" === g) // partition pruning: 1/nGroups of the bytes
        .select($"doc_id", $"text")
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val slice = math.min(nSlices - 1, (id * nSlices / nDocs).toInt)
          if (withPos) {
            // positions encoded map-side into self-delimiting varbyte
            // chunks — the shuffle carries compact bytes, and block
            // assembly concatenates without re-encoding
            val (dl, tps) = Analyzer.termPositions(text)
            tps.iterator.map { case (t, ps) =>
              (t, slice, id, ps.length, dl, Codec.encodePosChunk(ps))
            }
          } else {
            val (dl, tfs) = Analyzer.termFreqs(text)
            tfs.iterator.map { case (t, tf) => (t, slice, id, tf, dl, null: Array[Byte]) }
          }
        }
        .toDF("term", "slice", "doc_id", "tf", "doc_len", "pos")
    }
    buildGroups(spark, indexDir, cfg, groupInput, failAfterGroups)
  }

  /** Stages 2-3: posting groups + term dictionary. `groupInput(g)` must
    * return the term-doc rows `(term, slice, doc_id, tf, doc_len)` of
    * doc-range group g (slice nested in group: nSlices % nGroups == 0).
    * Shared by [[build]] (tokenizes staged text) and [[SegmentMerge]]
    * (decodes source-segment blocks) — both get group-level resumability.
    */
  def buildGroups(
      spark: SparkSession,
      indexDir: String,
      cfg: BuildConfig,
      groupInput: Int => DataFrame,
      failAfterGroups: Int = Int.MaxValue
  ): Unit = {
    import spark.implicits._
    val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
    val avgDl = if (st.avg_dl > 0) st.avg_dl else 1.0

    // ---- stage 2: posting groups (resumable unit = one group) ---------
    val blockSize = cfg.blockSize
    var groupsBuilt = 0
    (0 until cfg.nGroups).foreach { g =>
      val unit = s"grp-$g"
      if (!completedUnits(indexDir).contains(unit)) {
        if (groupsBuilt >= failAfterGroups)
          throw new RuntimeException(s"injected failure before $unit")
        val partsPerGroup = math.max(1, cfg.nPartitions / cfg.nGroups)
        // per-partition build metrics ride the write job as an accumulator
        // (one add per completed task; action-side accumulators are
        // exactly-once per successful task) — no second read-the-postings
        // job per group. Input is sorted by term, so distinct terms are
        // counted as run transitions.
        val metricsAcc =
          spark.sparkContext.collectionAccumulator[(Int, Long, Long, Long, Long)](s"graft.metrics.grp-$g")
        val blocks = groupInput(g)
          .repartition(partsPerGroup, $"term", $"slice")
          .sortWithinPartitions("term", "slice", "doc_id")
          .select($"term", $"slice", $"doc_id", $"tf", $"doc_len", $"pos")
          .as[(String, Int, Long, Int, Int, Array[Byte])]
          .mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val base = blockify(it, g, blockSize, avgDl)
            new Iterator[PostingRow] {
              private var terms = 0L
              private var postings = 0L
              private var nBlocks = 0L
              private var bytes = 0L
              private var lastTerm: String = null
              private var reported = false
              def hasNext: Boolean = {
                // volatile read only on the production path (CAS just for tests)
                if (nBlocks > 0 && chaosOnce.get && chaosOnce.compareAndSet(true, false))
                  throw new RuntimeException("injected mid-task chaos")
                val h = base.hasNext
                if (!h && !reported) {
                  reported = true
                  if (nBlocks > 0) metricsAcc.add((pid, terms, postings, nBlocks, bytes))
                }
                h
              }
              def next(): PostingRow = {
                val r = base.next()
                if (r.term != lastTerm) { terms += 1; lastTerm = r.term }
                postings += r.count
                nBlocks += 1
                bytes += r.deltas.length + r.tfs.length + r.dls.length + r.poss.length
                r
              }
            }
          }
        // `grp` comes back as the directory partition column on read.
        // The block payloads (deltas/tfs/dls) are already entropy-coded by
        // our codec — parquet's snappy layer on top buys ~nothing for them
        // and costs CPU; term/metadata columns still get parquet dictionary
        // + RLE encoding, which compression=uncompressed does not disable.
        timed(s"postings-grp-$g")(blocks.drop("grp")
          .write.mode(SaveMode.Overwrite)
          .option("compression", sys.env.getOrElse("GRAFT_POSTINGS_CODEC", "uncompressed"))
          .parquet(s"$indexDir/postings/grp=$g"))

        val metricRows = scala.jdk.CollectionConverters
          .ListHasAsScala(metricsAcc.value).asScala.toSeq.sortBy(_._1)
          .map { case (pid, terms, postings, nBlocks, bytes) =>
            (pid, terms, postings, nBlocks, bytes, "committed")
          }
        timed(s"metrics-grp-$g")(metricRows
          .toDF("partition_id", "terms", "postings", "blocks", "bytes", "status")
          .coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$indexDir/build_metrics/grp=$g"))
        commitUnit(indexDir, unit)
        groupsBuilt += 1
      }
    }

    // ---- stage 3: term dictionary (df per term) ------------------------
    // Derived from posting-block METADATA (count + tf_sum columns written
    // at encode time), not by re-shuffling every term-doc row or decoding
    // tf bytes: the scan is column-pruned to 3 small columns and the
    // input is ~blockSize× smaller than the posting stream. Each
    // (term, slice) sub-list lives in exactly one partition, so summing
    // block counts per term is exact.
    if (!completedUnits(indexDir).contains("terms")) timed("terms") {
      readPostings(spark, indexDir)
        .select($"term", $"count".cast("long").as("doc_freq"), $"tf_sum".as("total_tf"))
        .groupBy($"term")
        .agg(sum($"doc_freq").as("doc_freq"), sum($"total_tf").as("total_tf"))
        .repartitionByRange(math.max(1, cfg.nPartitions / 4), $"term")
        .sortWithinPartitions("term")
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/terms")
      commitUnit(indexDir, "terms")
    }

    commitUnit(indexDir, "done")
  }

  private val EmptyBytes = Array.empty[Byte]

  /** Encode one sorted partition iterator into posting blocks.
    * Input rows sorted by (term, slice, doc_id); consecutive runs of the
    * same (term, slice) become one posting sub-list, chunked into blocks.
    * Per-posting position chunks (nullable) concatenate into the block's
    * `poss` stream without re-encoding.
    */
  def blockify(
      it: Iterator[(String, Int, Long, Int, Int, Array[Byte])],
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
        val (term, slice, _, _, _, _) = in.head
        if (term != curTerm || slice != curSlice) {
          curTerm = term; curSlice = slice; blockId = 0
        }
        val ids = new ArrayBuffer[Long](blockSize)
        val tfs = new ArrayBuffer[Int](blockSize)
        val dls = new ArrayBuffer[Int](blockSize)
        val posOut = new ArrayBuffer[Byte]()
        var maxImpact = 0.0
        var tfSum = 0L
        var maxTf = 0
        var minDl = Int.MaxValue
        while (
          in.hasNext && ids.length < blockSize && {
            val h = in.head; h._1 == term && h._2 == slice
          }
        ) {
          val (_, _, docId, tf, dl, pos) = in.next()
          ids += docId; tfs += tf; dls += dl
          tfSum += tf
          if (tf > maxTf) maxTf = tf
          if (dl < minDl) minDl = dl
          if (pos != null) posOut ++= pos
          val imp = impact(tf, dl, avgDl)
          if (imp > maxImpact) maxImpact = imp
        }
        val row = PostingRow(
          grp, slice, term, blockId,
          ids.head, ids.last, ids.length,
          Codec.encodeGapsFromBase(ids.toArray),
          Codec.encodeIntsAuto(tfs.toArray),
          Codec.encodeIntsAuto(dls.toArray),
          if (posOut.isEmpty) EmptyBytes else posOut.toArray,
          tfSum,
          maxImpact,
          maxTf,
          if (minDl == Int.MaxValue) 0 else minDl
        )
        blockId += 1
        row
      }
    }
  }

  // ---- readers --------------------------------------------------------
  def readDocs(spark: SparkSession, indexDir: String): Dataset[Doc] = {
    import spark.implicits._
    // built indexes carry (text, grp) in the docs table — column pruning
    // means this select never reads the text column off disk
    spark.read.parquet(s"$indexDir/docs")
      .select("doc_id", "url", "warc_ts", "lang", "doc_len")
      .as[Doc]
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
