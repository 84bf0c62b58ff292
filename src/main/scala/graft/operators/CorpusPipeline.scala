package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the RefinedWeb/CCNet macro
  * pipeline (public methodology) composed from this repo's operators,
  * with per-stage survivor counts:
  *
  *   1. language filter        (TextAnalysis.analyze lang_pred)
  *   2. quality thresholds     (token count / stopword ratio — C4/Gopher)
  *   3. repetition filters     (top-bigram / dup-trigram caps — Gopher)
  *   4. exact dedup            (Dedup.exact, keep the smallest id)
  *   5. near-dup removal       (MinHash-LSH pairs → connected
  *                              components → keep each cluster's min)
  *   6. eval decontamination   (drop docs sharing ≥ leakFrac of their
  *                              n-grams with the eval suite — GPT-3/PaLM)
  *
  * Scale shape: stages 1–3 are map-side feature passes with id-semi-join
  * survivor cuts; 4–6 are the bucketed dedup/join operators — nothing
  * here is new machinery, which is the point: curation IS a composition
  * of the engine's first-class ops. `withCounts = true` adds one count
  * action per stage (the curation-report mode); false keeps the whole
  * chain one lazy plan for production runs.
  */
object CorpusPipeline {

  final case class Config(
      lang: String = "en",
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      maxStopwordRatioE6: Long = 900000,
      maxTopBigramE6: Long = 300000, // Gopher: top-2-gram ≤ 0.20 (loose default here)
      maxDupTrigramE6: Long = 600000,
      minhashThreshold: Double = 0.9,
      decontaminateN: Int = 3,
      maxLeakFracE6: Long = 500000 // drop when > 50% of n-grams leak
  )

  /** Returns (survivors as (idCol, textCol), per-stage counts — empty
    * when withCounts = false). `evalDocs`: the held-out benchmark frame
    * for decontamination (None skips stage 6).
    */
  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None,
      withCounts: Boolean = true
  ): (DataFrame, Seq[(String, Long)]) = {
    val counts = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    def note(stage: String, df: DataFrame): DataFrame = {
      if (withCounts) counts += stage -> df.count()
      df
    }
    val base = docs.select(col(idCol), col(textCol))
    note("input", base)

    // 1–2: one feature pass serves language + quality
    val feats = TextAnalysis.analyze(base, idCol, textCol)
    val keepLq = feats.where(
      col("lang_pred") === cfg.lang &&
        col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
        col("stopword_ratio_e6") <= cfg.maxStopwordRatioE6)
      .select(col("doc_id").as(idCol))
    val afterLq = note("lang_quality",
      base.join(keepLq, idCol))

    // 3: repetition caps (separate pass — bigram/trigram maps)
    val rep = TextAnalysis.repetition(afterLq, idCol, textCol)
      .where(col("top_bigram_e6") <= cfg.maxTopBigramE6 &&
        col("dup_trigram_e6") <= cfg.maxDupTrigramE6)
      .select(col("doc_id").as(idCol))
    val afterRep = note("repetition", afterLq.join(rep, idCol))

    // 4: exact dedup — keep each text's smallest id
    val keepExact = Dedup.exact(afterRep, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val afterExact = note("exact_dedup", afterRep.join(keepExact, idCol))

    // 5: near-dup clusters → keep the min-id member of each cluster
    // (cluster_id IS the min member id by construction)
    val pairs = Dedup.minHashLsh(afterExact, idCol, textCol, threshold = cfg.minhashThreshold)
    val dropNear = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")), "id_a", "id_b",
      afterExact, idCol)
      .where(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    val afterNear = note("near_dedup", afterExact.join(dropNear, Seq(idCol), "left_anti"))

    // 6: decontamination — drop docs leaking too much eval content
    val out = evalDocs match {
      case None => afterNear
      case Some(ev) =>
        val leaks = Decontaminate.ngramOverlap(
          ev.select(col(idCol), col(textCol)), afterNear, idCol, textCol, cfg.decontaminateN)
          .where(col("n_hit") * lit(1000000L) > col("n_ngrams") * lit(cfg.maxLeakFracE6))
          .select(col(idCol))
        note("decontaminate", afterNear.join(leaks, Seq(idCol), "left_anti"))
    }
    (out, counts.toList)
  }
}
