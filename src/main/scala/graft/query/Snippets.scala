package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Analyzer
import graft.index.IndexBuilder

/** Highlighted snippets for top-k hits — the ES highlight phase (the
  * reference's event logs are READ through Kibana, which highlights the
  * query terms inside the matching comment/data fields). Engine
  * rendition of the unified highlighter's re-analyze mode: ES, too,
  * re-analyzes the stored text when offsets aren't indexed — we never
  * index offsets, so this is the exact analog.
  *
  * Fragment choice (deterministic, mirrored by the tests): over the
  * token stream of the stored text, the window of `window` tokens whose
  * matched-term occurrences carry the highest idf sum wins (a rare term
  * beats repeats of a common one — Lucene's passage scoring shape);
  * ties go to the leftmost window. Matched tokens are wrapped
  * `pre`/`post` in the ORIGINAL text via the analyzer's offset variant —
  * normalization never leaks into the fragment.
  *
  * Scale shape: operates on the ≤ k hydrated hits only — one
  * pushdown-filtered docs read (the fetch phase), a per-row token walk,
  * zero shuffles beyond the broadcast hydrate join. The corpus is never
  * re-scanned.
  */
object Snippets {

  def highlight(
      spark: SparkSession,
      indexDir: String,
      hits: DataFrame,
      queryTerms: Seq[String],
      window: Int = 20,
      pre: String = "<em>",
      post: String = "</em>"
  ): DataFrame = {
    import spark.implicits._
    require(window > 0, "window must be positive")
    val terms = queryTerms.distinct
    // idf per query term (absent → df 0 → still highlighted, weight ln(1+(n+0.5)/0.5))
    val stats = IndexBuilder.readStats(spark, indexDir)
    val dfs = IndexBuilder.readTerms(spark, indexDir)
      .where($"term".isin(terms: _*))
      .collect().map(t => t.term -> t.doc_freq).toMap
    val weights: Map[String, Double] =
      terms.map(t => t -> NaiveBm25.idf(stats.n_docs, dfs.getOrElse(t, 0L))).toMap
    val bCtx = spark.sparkContext.broadcast((weights, window, pre, post))

    val snippets = Search.hydrate(spark, indexDir, hits, withText = true)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val (ws, win, p0, p1) = bCtx.value
        (id, snippetOf(text, ws, win, p0, p1))
      }
      .toDF("doc_id", "snippet")
    hits.join(broadcast(snippets), Seq("doc_id"), "left")
  }

  /** Pure fragment builder (driver/test-callable). */
  def snippetOf(
      text: String,
      weights: Map[String, Double],
      window: Int,
      pre: String,
      post: String
  ): String = {
    val (toks, starts, ends) = Analyzer.tokenizeWithOffsets(text)
    if (toks.isEmpty) return ""
    val w = math.min(window, toks.length)
    val tokWeight = toks.map(weights.getOrElse(_, 0.0))
    // best window = max idf sum over matched occurrences, leftmost tie
    var best = 0
    var bestScore = tokWeight.take(w).sum
    var cur = bestScore
    var s = 1
    while (s + w <= toks.length) {
      cur += tokWeight(s + w - 1) - tokWeight(s - 1)
      if (cur > bestScore + 1e-12) { bestScore = cur; best = s }
      s += 1
    }
    // wrap matched tokens of [best, best+w) in the ORIGINAL char stream
    val sb = new StringBuilder
    val fragStart = starts(best)
    var i = best
    var pos = fragStart
    while (i < best + w) {
      sb.append(text.substring(pos, starts(i))) // NOT append(seq,a,b): that overload boxes a tuple
      val tokenText = text.substring(starts(i), ends(i))
      if (tokWeight(i) > 0.0) sb.append(pre).append(tokenText).append(post)
      else sb.append(tokenText)
      pos = ends(i)
      i += 1
    }
    sb.toString
  }
}
