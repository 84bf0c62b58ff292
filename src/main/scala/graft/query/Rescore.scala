package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.AttrPred

/** ES `rescore` with a `function_score` decay — the event-log relevance
  * shape: BM25 finds the candidates, recency decides among them (ES
  * users put a gauss/exp decay on `@timestamp` next to the text query;
  * the reference's event fields are provisioned for exactly this kind
  * of read). Semantics mirror ES's rescore window: the top-`window`
  * hits by BM25 (global, exact) are re-ranked by
  *
  *   combined = bm25 · exp(−|origin − warc_ts| · ln 2 / halfLifeMs)
  *
  * (ES `exp` decay in multiply mode, offset 0, explicit `origin` — no
  * hidden "now", so results are deterministic and oracle-checkable);
  * docs outside the window keep their BM25 order and cannot re-enter —
  * exactly ES's contract, which is what makes rescoring top-k-safe: the
  * expensive scorer touches `window` docs, never the corpus.
  *
  * Scale shape: one ranked search (the WAND plan) + one ≤window-row
  * hydrate join (pushdown by id) + driver-side re-sort of ≤window rows.
  *
  * Gate-determinism note: the BM25 factor is quantized to 1e-4 before
  * the multiply (the same quantization every gate query publishes), so
  * the DuckDB oracle reproduces the combined score bit-for-bit from its
  * own quantized scores.
  */
object Rescore {

  def recencyTopK(
      spark: SparkSession,
      indexDir: String,
      queryTerms: Seq[String],
      mode: String,
      k: Int,
      window: Int,
      originMs: Long,
      halfLifeMs: Long,
      attrFilter: AttrPred = null,
      mustNot: Seq[String] = Nil
  ): DataFrame = {
    import spark.implicits._
    require(window >= k, "rescore window must cover k")
    require(halfLifeMs > 0, "halfLifeMs must be positive")
    val hits = Search.topK(spark, indexDir, queryTerms, mode, window,
      attrFilter = attrFilter, mustNot = mustNot)
    val withTs = Search.hydrate(spark, indexDir, hits)
      .select($"doc_id", $"score", unix_millis($"warc_ts").as("ts_ms"))
    val o = originMs
    val hl = halfLifeMs
    withTs
      .as[(Long, Double, Long)]
      .map { case (id, score, ts) =>
        val q = math.round(score * 10000.0) / 10000.0 // published quantization
        val decay = math.exp(-math.abs(o - ts).toDouble * math.log(2.0) / hl.toDouble)
        (id, math.round(q * decay * 10000.0))
      }
      .toDF("doc_id", "combined_e4")
      .orderBy(desc("combined_e4"), asc("doc_id"))
      .limit(k)
  }
}
