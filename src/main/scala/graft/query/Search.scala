package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.query.BlockMaxWand.{BlockRef, FilterIter, PostingIter}

/** Distributed BM25 top-k over the on-disk index.
  *
  * Plan (scale-first — nothing term-sized ever reaches the driver):
  *   1. dictionary lookup: `terms` table filtered to the ≤ few query
  *      terms (parquet predicate pushdown on the term-sorted files) —
  *      yields df per term → idf (collect of ≤ |q| rows);
  *   2. posting scan: postings filtered to query terms (pushdown again;
  *      files are sorted by term within partitions so row-group min/max
  *      skips almost everything);
  *   3. shuffle the surviving blocks by doc-range `slice` — all query
  *      terms' postings for one doc range land in one task (the only
  *      shuffle, and it moves just the query terms' blocks);
  *   4. per-slice block-max WAND → slice-local top-k (k rows per slice);
  *   5. global top-k = sort (score desc, doc_id asc) + limit over
  *      nSlices·k rows.
  *
  * Slices are disjoint doc ranges, so slice-local top-k union ⊇ global
  * top-k — the merge is exact.
  */
object Search {

  final case class QueryHit(doc_id: Long, score: Double)

  /** `docFilter` (nullable Column over the docs table, e.g.
    * `col("lang") === "en" && col("warc_ts") >= ...`): ES filter-context
    * semantics — the reference's index template provisions 14 keyword + 2
    * date fields NEXT TO the text fields (`ElasticSearchStorage.cs:208-233`)
    * precisely so ranked queries can be predicated; scores are unchanged,
    * candidates outside the filter are skipped inside WAND.
    *
    * Scale shape: the filter's matching (slice, doc_id) pairs — 12 bytes
    * each, column-pruned off the docs table — co-shuffle with the matched
    * posting blocks by slice (one exchange); each WAND task gets its own
    * slice's sorted allow-list. Selective filters (the interactive case)
    * ship tiny lists and let WAND leapfrog over the gaps; for
    * low-selectivity date ranges prefer time-bucketed segments (partition
    * pruning) with this as the residual intra-segment filter.
    */
  def topK(
      spark: SparkSession,
      indexDir: String,
      queryTerms: Seq[String],
      mode: String,
      k: Int,
      docFilter: Column = null
  ): DataFrame = {
    import spark.implicits._
    val terms = queryTerms.distinct
    val stats = IndexBuilder.readStats(spark, indexDir)
    val n = stats.n_docs
    val avgDl = if (stats.avg_dl > 0) stats.avg_dl else 1.0

    val dfs: Map[String, Long] = IndexBuilder
      .readTerms(spark, indexDir)
      .where($"term".isin(terms: _*))
      .collect()
      .map(t => t.term -> t.doc_freq)
      .toMap

    if (mode == "and" && terms.exists(t => !dfs.contains(t)))
      return spark.emptyDataset[QueryHit].toDF()
    val present = terms.filter(dfs.contains)
    if (present.isEmpty) return spark.emptyDataset[QueryHit].toDF()

    val idfs: Array[Double] =
      terms.map(t => NaiveBm25.idf(n, dfs.getOrElse(t, 0L))).toArray
    val termIdx: Map[String, Int] = terms.zipWithIndex.toMap
    val bTerms = spark.sparkContext.broadcast((terms.toArray, idfs))

    val blocks = IndexBuilder
      .readPostings(spark, indexDir)
      .where($"term".isin(terms: _*))
      .select(
        $"slice", $"term", $"block_id", $"doc_id_min", $"doc_id_max",
        $"count", $"deltas", $"tfs", $"dls", $"poss", $"max_impact"
      )
      .as[(Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)]

    val isAnd = mode == "and"
    type BlockRow = (Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)

    def wand(rows: Iterator[BlockRow], filter: FilterIter): Iterator[QueryHit] = {
      val (qTerms, qIdfs) = bTerms.value
      val byTerm = rows.toArray.groupBy(_._2)
      val iters = qTerms.iterator.zipWithIndex.flatMap { case (t, ti) =>
        byTerm.get(t).map { rs =>
          val refs = rs
            .sortBy(r => (r._4, r._3)) // by doc_id_min, block_id
            .map(r => BlockRef(r._4, r._5, r._6, r._7, r._8, r._9, r._10, r._11))
          new PostingIter(ti, qIdfs(ti), refs, avgDl)
        }
      }.toArray
      val hits =
        if (isAnd) {
          if (iters.length < qTerms.length) Array.empty[BlockMaxWand.Hit]
          else BlockMaxWand.and(iters, k, filter)
        } else BlockMaxWand.or(iters, k, filter)
      hits.iterator.map(h => QueryHit(h.docId, h.score))
    }

    val localTopK =
      if (docFilter == null)
        blocks.groupByKey(_._1).flatMapGroups { (_, rows) => wand(rows, null) }
      else {
        // matching doc ids per slice (12-byte rows; docs scan is column-
        // pruned to the predicate columns + slice + doc_id)
        val filterIds = spark.read.parquet(s"$indexDir/docs")
          .where(docFilter)
          .select($"slice".cast("int"), $"doc_id")
          .as[(Int, Long)]
        blocks
          .groupByKey(_._1)
          .cogroup(filterIds.groupByKey(_._1)) { (_, rows, fids) =>
            val allow = fids.map(_._2).toArray
            if (allow.isEmpty) Iterator.empty
            else {
              java.util.Arrays.sort(allow)
              wand(rows, new FilterIter(allow))
            }
          }
      }

    localTopK
      .toDF()
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Exact-phrase top-k (ES `match_phrase`); see BlockMaxWand.phrase for
    * the scoring contract. Same scale shape as topK: pushdown on the ≤
    * few distinct terms, one shuffle of matched blocks (+ filter ids) by
    * slice, per-slice leapfrog+positional verify, nSlices·k global merge.
    */
  def phraseTopK(
      spark: SparkSession,
      indexDir: String,
      phraseTerms: Seq[String],
      k: Int,
      docFilter: Column = null
  ): DataFrame = {
    import spark.implicits._
    require(phraseTerms.nonEmpty, "empty phrase")
    val distinctTerms = phraseTerms.distinct // first-occurrence order
    val offsets: Array[Array[Int]] = distinctTerms.map { t =>
      phraseTerms.zipWithIndex.collect { case (pt, i) if pt == t => i }.toArray
    }.toArray

    val stats = IndexBuilder.readStats(spark, indexDir)
    val n = stats.n_docs
    val avgDl = if (stats.avg_dl > 0) stats.avg_dl else 1.0
    val dfs: Map[String, Long] = IndexBuilder
      .readTerms(spark, indexDir)
      .where($"term".isin(distinctTerms: _*))
      .collect()
      .map(t => t.term -> t.doc_freq)
      .toMap
    if (distinctTerms.exists(t => !dfs.contains(t)))
      return spark.emptyDataset[QueryHit].toDF()
    // idf summed over every phrase POSITION (duplicate terms count per
    // occurrence — Lucene PhraseQuery shape; oracle mirrors)
    val idfSum = phraseTerms.map(t => NaiveBm25.idf(n, dfs(t))).sum
    val bCtx = spark.sparkContext.broadcast((distinctTerms.toArray, offsets, idfSum))

    val blocks = IndexBuilder
      .readPostings(spark, indexDir)
      .where($"term".isin(distinctTerms: _*))
      .select(
        $"slice", $"term", $"block_id", $"doc_id_min", $"doc_id_max",
        $"count", $"deltas", $"tfs", $"dls", $"poss", $"max_impact"
      )
      .as[(Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)]

    def run(
        rows: Iterator[(Int, String, Int, Long, Long, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte], Double)],
        filter: FilterIter
    ): Iterator[QueryHit] = {
      val (qTerms, offs, idfS) = bCtx.value
      val byTerm = rows.toArray.groupBy(_._2)
      if (!qTerms.forall(byTerm.contains)) return Iterator.empty
      val iters = qTerms.map { t =>
        val refs = byTerm(t)
          .sortBy(r => (r._4, r._3))
          .map(r => BlockRef(r._4, r._5, r._6, r._7, r._8, r._9, r._10, r._11))
        new PostingIter(0, 0.0, refs, avgDl) // idf unused in phrase scoring
      }
      BlockMaxWand.phrase(iters, offs, idfS, k, filter)
        .iterator.map(h => QueryHit(h.docId, h.score))
    }

    val localTopK =
      if (docFilter == null)
        blocks.groupByKey(_._1).flatMapGroups { (_, rows) => run(rows, null) }
      else {
        val filterIds = spark.read.parquet(s"$indexDir/docs")
          .where(docFilter)
          .select($"slice".cast("int"), $"doc_id")
          .as[(Int, Long)]
        blocks
          .groupByKey(_._1)
          .cogroup(filterIds.groupByKey(_._1)) { (_, rows, fids) =>
            val allow = fids.map(_._2).toArray
            if (allow.isEmpty) Iterator.empty
            else {
              java.util.Arrays.sort(allow)
              run(rows, new FilterIter(allow))
            }
          }
      }

    localTopK
      .toDF()
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
