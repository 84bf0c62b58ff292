package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — the ES 8 `rrf` retriever shape: combine a
  * lexical (BM25) top-w list and one or more dense (vector) top-w lists
  * into a single ranking. Reciprocal Rank Fusion is public methodology
  * (Cormack, Clarke & Büttcher, SIGIR 2009): rrf(d) = Σ_lists
  * 1/(rankConstant + rank_d) over the lists containing d.
  *
  * Scale shape: fusion consumes lists that are ALREADY top-w cuts (each
  * the output of a block-max WAND / ANN probe — w rows, driver-scale),
  * so the window rank, union, and sum here touch ≤ Σw rows regardless of
  * corpus size. The heavy lifting stays in the per-retriever engines;
  * RRF is rank-only, so the two retrievers' score scales never need
  * calibration (the reason ES made it the default fusion).
  */
object Hybrid {

  /** Fuse single-query lists of (doc_id, score): rank each by
    * (score desc, doc_id asc), sum reciprocal ranks, top-k by
    * (rrf desc, doc_id asc). Docs missing from a list simply contribute
    * nothing for it (standard RRF).
    */
  def rrf(lists: Seq[DataFrame], k: Int, rankConstant: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one list")
    require(rankConstant >= 1, "rankConstant must be positive")
    // single-partition window is fine BY CONTRACT: each input is a
    // top-w cut (w rows), not a corpus-scale frame
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    val ranked = lists.map(_.select(col("doc_id"),
      row_number().over(w).as("rank")))
    ranked.reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(sum(lit(1.0) / (lit(rankConstant.toDouble) + col("rank"))).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** ES 8 `linear` retriever: weighted sum of per-list MIN-MAX
    * normalized scores — norm(s) = (s − min)/(max − min) over the list's
    * own top-w window (a constant-score list normalizes to 1.0, the ES
    * degenerate-case choice), fused = Σ weight·norm over the lists
    * containing the doc. Unlike [[rrf]] this is score-sensitive, so
    * callers who need cross-engine reproducibility should quantize the
    * input scores first (raw BM25 doubles differ in the last ulp across
    * engines; ranks don't).
    */
  def linear(lists: Seq[(DataFrame, Double)], k: Int): DataFrame = {
    require(lists.nonEmpty, "linear fusion needs at least one list")
    require(lists.forall(_._2 >= 0.0), "weights must be non-negative")
    val normed = lists.map { case (df, weight) =>
      val mm = df.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
      df.crossJoin(broadcast(mm))
        .select(col("doc_id"),
          (lit(weight) * when(col("mx") > col("mn"),
            (col("score") - col("mn")) / (col("mx") - col("mn")))
            .otherwise(lit(1.0))).as("score"))
    }
    normed.reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(sum(col("score")).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Batched variant: lists carry (qid, doc_id, score); ranks are
    * per-qid, output is top-k per qid. The window partitions by qid, so
    * a thousand-query batch fans across the cluster.
    */
  def rrfByQuery(lists: Seq[DataFrame], k: Int, rankConstant: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one list")
    require(rankConstant >= 1, "rankConstant must be positive")
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("doc_id"))
    val ranked = lists.map(_.select(col("qid"), col("doc_id"),
      row_number().over(w).as("rank")))
    val fused = ranked.reduce(_ unionByName _)
      .groupBy("qid", "doc_id")
      .agg(sum(lit(1.0) / (lit(rankConstant.toDouble) + col("rank"))).as("score"))
    val cut = Window.partitionBy("qid").orderBy(desc("score"), asc("doc_id"))
    fused.withColumn("rn", row_number().over(cut))
      .where(col("rn") <= k)
      .drop("rn")
  }
}
