package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Analyzer

/** ES percolator (reverse search — the Watcher/alerting path): queries
  * are REGISTERED, documents stream through, and each doc reports which
  * queries it matches. The reference's deployments pair the exporter
  * with exactly this kind of standing alert ("notify when severity:error
  * AND service:x appears"); the percolate query is public ES surface.
  *
  * Scale shape: the registered query set is small by nature (thousands
  * of alerts, not billions) — it BROADCASTS; matching is a pure map
  * over the document stream (tokenize once, set-membership per query
  * term), zero shuffle, so it rides the same executors as ingest and
  * composes with Structured Streaming ingestion unchanged (a
  * `transform` before the sink). Per-doc cost is O(tokens + Σ|query
  * terms|) with an early-exit AND walk.
  *
  * Supported query shape mirrors the engine's flat bool: `terms` with
  * mode "and"/"or" and optional `minShouldMatch` — the same contract as
  * [[graft.query.Search.topK]] candidates (scoring is the retriever's
  * job; percolation is membership, like ES's constant-score percolate).
  */
object Percolate {

  final case class Query(query_id: Long, terms: Seq[String], mode: String, msm: Int)

  /** (docIdCol, query_id) pairs — one row per (doc, matching query).
    * `queries`: (query_id, terms array, mode, msm); invalid modes fail
    * loudly at broadcast build, not silently per row.
    */
  def percolate(
      docs: DataFrame,
      docIdCol: String,
      textCol: String,
      queries: Seq[Query]
  ): DataFrame = {
    require(queries.nonEmpty, "no registered queries")
    queries.foreach { q =>
      require(q.mode == "and" || q.mode == "or", s"bad mode '${q.mode}' for query ${q.query_id}")
      require(q.terms.nonEmpty, s"empty terms for query ${q.query_id}")
      require(q.msm >= 1 && q.msm <= q.terms.distinct.size,
        s"msm out of range for query ${q.query_id}")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // pre-resolve each query to (id, distinct terms, required-match count)
    val compiled: Array[(Long, Array[String], Int)] = queries.map { q =>
      val ts = q.terms.distinct.toArray
      val need = if (q.mode == "and") ts.length else q.msm
      (q.query_id, ts, need)
    }.toArray
    val bQueries = spark.sparkContext.broadcast(compiled)
    docs
      .select(col(docIdCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = Analyzer.tokenize(text)
        if (toks.isEmpty) Iterator.empty
        else {
          val set = new java.util.HashSet[String]()
          var i = 0
          while (i < toks.length) { set.add(toks(i)); i += 1 }
          bQueries.value.iterator.flatMap { case (qid, ts, need) =>
            var hits = 0
            var j = 0
            // early exit: stop once satisfied or unreachable
            while (j < ts.length && hits < need && hits + (ts.length - j) >= need) {
              if (set.contains(ts(j))) hits += 1
              j += 1
            }
            if (hits >= need) Some((id, qid)) else None
          }
        }
      }
      .toDF(docIdCol, "query_id")
  }
}
