package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexBuilder
import graft.query.BlockMaxWand.{BlockRef, PostingIter}

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

  def topK(
      spark: SparkSession,
      indexDir: String,
      queryTerms: Seq[String],
      mode: String,
      k: Int
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
    val localTopK = blocks
      .groupByKey(_._1) // slice
      .flatMapGroups { (_, rows) =>
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
            else BlockMaxWand.and(iters, k)
          } else BlockMaxWand.or(iters, k)
        hits.iterator.map(h => QueryHit(h.docId, h.score))
      }

    localTopK
      .toDF()
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }
}
