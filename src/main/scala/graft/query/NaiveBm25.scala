package graft.query

import graft.functions.Analyzer
import graft.index.IndexBuilder.{B, K1}

/** In-repo naive BM25 oracle (SURVEY.md §5.3): the stand-in for the
  * reference's Elasticsearch scoring — exhaustive scoring with the exact
  * ES-default similarity (BM25, k1=1.2, b=0.75, standard analyzer; the
  * reference's index template sets no custom similarity/analyzer,
  * `ElasticSearchStorage.cs:200-236`).
  *
  * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))          [Lucene BM25]
  * score(d,q) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))
  *
  * Single source of truth for rank identity: WAND results must match this
  * exactly (same float order of operations: per-term products summed in
  * query-term order).
  */
object NaiveBm25 {

  final case class Scored(docId: Long, score: Double)

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** Exhaustively score `corpus` (docId → text) for `terms`.
    * mode "and" = doc must contain every term; "or" = any.
    * Returns top-k sorted by (score desc, docId asc) — ascending-docID
    * tie-break, the convention our engine fixes (FIXTURES.md §3).
    */
  def topK(
      corpus: Seq[(Long, String)],
      terms: Seq[String],
      mode: String,
      k: Int
  ): Seq[Scored] = topKFiltered(corpus, terms, mode, k, null)

  /** Filtered variant (ES filter-context semantics): `allowed` gates which
    * docs may be RETURNED, but N/avgdl/df — and therefore every score —
    * are computed over the FULL corpus, exactly like an ES bool query
    * with a filter clause next to the scoring match clauses.
    */
  def topKFiltered(
      corpus: Seq[(Long, String)],
      terms: Seq[String],
      mode: String,
      k: Int,
      allowed: Long => Boolean
  ): Seq[Scored] = {
    val analyzed = corpus.map { case (id, text) =>
      val (dl, tfs) = Analyzer.termFreqs(text)
      (id, dl, tfs.toMap)
    }
    val n = corpus.size.toLong
    val avgDl = {
      val total = analyzed.map(_._2.toLong).sum
      if (n > 0 && total > 0) total.toDouble / n else 1.0
    }
    val dfs: Map[String, Long] =
      terms.distinct.map { t =>
        t -> analyzed.count { case (_, _, tfs) => tfs.contains(t) }.toLong
      }.toMap
    val idfs: Map[String, Double] = dfs.map { case (t, df) => t -> idf(n, df) }

    val scored = analyzed.flatMap { case (id, dl, tfs) =>
      val present = terms.distinct.filter(tfs.contains)
      val ok = (allowed == null || allowed(id)) && {
        if (mode == "and") present.size == terms.distinct.size
        else present.nonEmpty
      }
      if (!ok) None
      else {
        var s = 0.0
        terms.distinct.foreach { t =>
          tfs.get(t).foreach { tf =>
            s += idfs(t) * (tf / (tf + K1 * (1 - B + B * dl / avgDl)))
          }
        }
        Some(Scored(id, s))
      }
    }
    scored
      .sortBy(h => (-h.score, h.docId))
      .take(k)
  }

  /** Exhaustive synonym-group oracle (Search.synonymTopK contract —
    * Lucene SynonymQuery): each group scores as ONE term with
    * tf = Σ member tfs and idf from the MAX member df; per-doc score =
    * Σ over matched groups in group order; mode/msm count GROUPS.
    */
  def synonymTopK(
      corpus: Seq[(Long, String)],
      groups: Seq[Seq[String]],
      mode: String,
      k: Int,
      minShouldMatch: Int = 1,
      allowed: Long => Boolean = null
  ): Seq[Scored] = {
    val analyzed = corpus.map { case (id, text) =>
      val (dl, tfs) = Analyzer.termFreqs(text)
      (id, dl, tfs.toMap)
    }
    val n = corpus.size.toLong
    val avgDl = {
      val total = analyzed.map(_._2.toLong).sum
      if (n > 0 && total > 0) total.toDouble / n else 1.0
    }
    val gs = groups.map(_.distinct)
    val dfs: Map[String, Long] = gs.flatten.distinct.map { t =>
      t -> analyzed.count { case (_, _, tfs) => tfs.contains(t) }.toLong
    }.toMap
    val gIdfs = gs.map(g => idf(n, g.map(dfs).max))
    val scored = analyzed.flatMap { case (id, dl, tfs) =>
      if (allowed != null && !allowed(id)) None
      else {
        var s = 0.0
        var matched = 0
        gs.zipWithIndex.foreach { case (g, gi) =>
          val tfSum = g.flatMap(tfs.get).sum
          if (tfSum > 0) {
            matched += 1
            s += gIdfs(gi) * (tfSum / (tfSum + K1 * (1 - B + B * dl / avgDl)))
          }
        }
        val ok =
          if (mode == "and") matched == gs.size else matched >= minShouldMatch
        if (ok) Some(Scored(id, s)) else None
      }
    }
    scored.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Exhaustive fielded-search oracle (FieldedSearch contract — ES
    * `most_fields`): per-field stats, score = Σ_f boost_f · Σ_t
    * idf_f(t)·impact, candidates = any (field, term) match, sums in
    * fields-outer × terms-inner order.
    */
  def fieldedTopK(
      fieldCorpora: Seq[(Seq[(Long, String)], Double)], // (docId→fieldText, boost)
      terms: Seq[String],
      k: Int,
      allowed: Long => Boolean = null,
      perFieldTerms: Seq[Set[String]] = null // per-field rewrite mask (fielded prefix/fuzzy)
  ): Seq[Scored] = {
    val ts = terms.distinct
    val perField = fieldCorpora.map { case (corpus, boost) =>
      val analyzed = corpus.map { case (id, text) =>
        val (dl, tfs) = Analyzer.termFreqs(text)
        (id, dl, tfs.toMap)
      }
      val n = corpus.size.toLong
      val avgDl = {
        val total = analyzed.map(_._2.toLong).sum
        if (n > 0 && total > 0) total.toDouble / n else 1.0
      }
      val idfs = ts.map { t =>
        t -> idf(n, analyzed.count { case (_, _, tfs) => tfs.contains(t) }.toLong)
      }.toMap
      (analyzed.map(a => a._1 -> ((a._2, a._3))).toMap, avgDl, idfs, boost)
    }
    val ids = fieldCorpora.head._1.map(_._1)
      .filter(id => allowed == null || allowed(id))
    val scored = ids.flatMap { id =>
      var s = 0.0
      var any = false
      perField.zipWithIndex.foreach { case ((docs, avgDl, idfs, boost), fi) =>
        val (dl, tfs) = docs(id)
        ts.foreach { t =>
          if (perFieldTerms == null || perFieldTerms(fi).contains(t)) {
            tfs.get(t).foreach { tf =>
              any = true
              s += boost * idfs(t) * (tf / (tf + K1 * (1 - B + B * dl / avgDl)))
            }
          }
        }
      }
      if (any) Some(Scored(id, s)) else None
    }
    scored.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Exhaustive FIELDED exact-phrase oracle (ES most_fields over
    * match_phrase clauses): score(d) = Σ_f boost_f · idfSum_f ·
    * impact(freq_f(d), dl_f(d), avgdl_f), summed in field order;
    * candidates = phrase occurs in ≥1 field; a field missing any phrase
    * term matches nothing in that field (Lucene PhraseQuery semantics).
    */
  def fieldedPhraseTopK(
      fieldCorpora: Seq[(Seq[(Long, String)], Double)],
      phrase: Seq[String],
      k: Int,
      allowed: Long => Boolean = null
  ): Seq[Scored] = {
    val perField = fieldCorpora.map { case (corpus, boost) =>
      val analyzed = corpus.map { case (id, text) => (id, Analyzer.tokenize(text)) }
      val n = corpus.size.toLong
      val avgDl = {
        val total = analyzed.map(_._2.length.toLong).sum
        if (n > 0 && total > 0) total.toDouble / n else 1.0
      }
      val dfs = phrase.distinct.map { t =>
        t -> analyzed.count { case (_, toks) => toks.contains(t) }.toLong
      }.toMap
      val idfSum = if (dfs.values.exists(_ == 0L)) 0.0 else phrase.map(t => idf(n, dfs(t))).sum
      (analyzed.toMap, avgDl, idfSum, boost)
    }
    def freqOf(toks: Array[String]): Int = {
      var freq = 0
      var p = 0
      while (p + phrase.length <= toks.length) {
        var ok = true
        var i = 0
        while (ok && i < phrase.length) { if (toks(p + i) != phrase(i)) ok = false; i += 1 }
        if (ok) freq += 1
        p += 1
      }
      freq
    }
    val ids = fieldCorpora.head._1.map(_._1).filter(id => allowed == null || allowed(id))
    val scored = ids.flatMap { id =>
      var s = 0.0
      var any = false
      perField.foreach { case (docs, avgDl, idfSum, boost) =>
        if (idfSum > 0.0) {
          val toks = docs(id)
          val freq = freqOf(toks)
          if (freq > 0) {
            any = true
            s += boost * idfSum * (freq.toDouble / (freq + K1 * (1 - B + B * toks.length.toDouble / avgDl)))
          }
        }
      }
      if (any) Some(Scored(id, s)) else None
    }
    scored.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Exhaustive sloppy-phrase oracle (BlockMaxWand.phraseSlop contract:
    * greedy ordered chain from every first-term occurrence, e6
    * fixed-point 1/(1+displacement) weights, freq = weightE6/10^6).
    * Token-array scan — no positions index, no gates.
    */
  def phraseSlopTopK(
      corpus: Seq[(Long, String)],
      phrase: Seq[String],
      slop: Int,
      k: Int,
      allowed: Long => Boolean = null
  ): Seq[Scored] = {
    val analyzed = corpus.map { case (id, text) => (id, Analyzer.tokenize(text)) }
    val n = corpus.size.toLong
    val avgDl = {
      val total = analyzed.map(_._2.length.toLong).sum
      if (n > 0 && total > 0) total.toDouble / n else 1.0
    }
    val dfs: Map[String, Long] = phrase.distinct.map { t =>
      t -> analyzed.count { case (_, toks) => toks.contains(t) }.toLong
    }.toMap
    if (dfs.values.exists(_ == 0L)) return Nil
    val idfSum = phrase.map(t => idf(n, dfs(t))).sum
    val scored = analyzed.flatMap { case (id, toks) =>
      if (allowed != null && !allowed(id)) None
      else {
        var wE6 = 0L
        var p0 = 0
        while (p0 < toks.length) {
          if (toks(p0) == phrase.head) {
            var prev = p0
            var j = 1
            var ok = true
            while (ok && j < phrase.length) {
              var q = prev + 1
              while (q < toks.length && toks(q) != phrase(j)) q += 1
              if (q >= toks.length) ok = false else { prev = q; j += 1 }
            }
            if (ok) {
              val disp = prev - p0 - (phrase.length - 1)
              if (disp <= slop) wE6 += 1000000L / (1L + disp)
            }
          }
          p0 += 1
        }
        if (wE6 == 0L) None
        else {
          val freq = wE6 / 1000000.0
          val dl = toks.length
          Some(Scored(id,
            idfSum * (freq / (freq + K1 * (1 - B + B * dl / avgDl)))))
        }
      }
    }
    scored.sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** Exhaustive exact-phrase oracle (BlockMaxWand.phrase contract:
    * freq = phrase occurrences, idf summed per phrase position).
    */
  def phraseTopK(
      corpus: Seq[(Long, String)],
      phrase: Seq[String],
      k: Int,
      allowed: Long => Boolean = null
  ): Seq[Scored] = {
    val analyzed = corpus.map { case (id, text) => (id, Analyzer.tokenize(text)) }
    val n = corpus.size.toLong
    val avgDl = {
      val total = analyzed.map(_._2.length.toLong).sum
      if (n > 0 && total > 0) total.toDouble / n else 1.0
    }
    val dfs: Map[String, Long] = phrase.distinct.map { t =>
      t -> analyzed.count { case (_, toks) => toks.contains(t) }.toLong
    }.toMap
    if (dfs.values.exists(_ == 0L)) return Nil
    val idfSum = phrase.map(t => idf(n, dfs(t))).sum
    val scored = analyzed.flatMap { case (id, toks) =>
      if (allowed != null && !allowed(id)) None
      else {
        var freq = 0
        var p = 0
        while (p + phrase.length <= toks.length) {
          var ok = true
          var i = 0
          while (ok && i < phrase.length) {
            if (toks(p + i) != phrase(i)) ok = false
            i += 1
          }
          if (ok) freq += 1
          p += 1
        }
        if (freq == 0) None
        else {
          val dl = toks.length
          Some(Scored(id, idfSum * (freq.toDouble / (freq + K1 * (1 - B + B * dl.toDouble / avgDl)))))
        }
      }
    }
    scored.sortBy(h => (-h.score, h.docId)).take(k)
  }
}
