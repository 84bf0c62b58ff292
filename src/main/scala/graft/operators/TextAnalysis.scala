package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Analyzer, TextFeatures}

/** Document-level text analysis over a `documents(doc_id, text, ...)`
  * table: language ID, quality scores, token counts, fingerprints — all
  * computed in ONE map-side pass per document (tokenize once, derive
  * everything), the same fusion discipline the reference applies in its
  * single-pass parse+enrich (`LgpReader.cs:102-176`).
  */
object TextAnalysis {

  final case class DocFeatures(
      doc_id: Long,
      lang_pred: String,
      n_chars: Long,
      n_tokens: Long,
      n_ws_tokens: Long,
      n_bpeish_tokens: Long,
      mean_token_len_e6: Long,
      stopword_ratio_e6: Long,
      digit_ratio_e6: Long,
      punct_ratio_e6: Long,
      max_repeat_ratio_e6: Long,
      fingerprint: Long,
      simhash: Long
  )

  private def e6(x: Double): Long = math.round(x * 1e6)

  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = Analyzer.tokenize(text)
        val q = TextFeatures.quality(text, toks)
        DocFeatures(
          doc_id = id,
          lang_pred = TextFeatures.langId(toks),
          n_chars = q.n_chars.toLong,
          n_tokens = q.n_tokens.toLong,
          n_ws_tokens = TextFeatures.wsTokenCount(text).toLong,
          n_bpeish_tokens = TextFeatures.bpeishTokenCount(text).toLong,
          mean_token_len_e6 = e6(q.mean_token_len),
          stopword_ratio_e6 = e6(q.stopword_ratio),
          digit_ratio_e6 = e6(q.digit_ratio),
          punct_ratio_e6 = e6(q.punct_ratio),
          max_repeat_ratio_e6 = e6(q.max_repeat_ratio),
          fingerprint = TextFeatures.fingerprint(toks),
          simhash = TextFeatures.simHash(toks)
        )
      }
      .toDF()
  }

  /** Gopher-style repetition quality signals per doc (docs with < 3
    * tokens are dropped — both fractions undefined):
    * (doc_id, top_bigram_e6, dup_trigram_e6) where top_bigram =
    * max-bigram-count / total-bigrams and dup_trigram =
    * 1 − distinct/total trigrams. Pure map stage (tokenize once).
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val (maxBig, totBig, distTri, totTri) =
          TextFeatures.repetition(Analyzer.tokenize(text))
        if (totTri == 0L) None
        // float-op order mirrors the SQL oracle exactly: (x * 1e6) / tot
        else Some((id,
          math.round(maxBig * 1e6 / totBig),
          math.round((totTri - distTri) * 1e6 / totTri)))
      }
      .toDF("doc_id", "top_bigram_e6", "dup_trigram_e6")
  }
}
