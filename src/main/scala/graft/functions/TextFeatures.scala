package graft.functions

import scala.collection.mutable

/** Text-analysis primitives for large-scale training-data pipelines:
  * shingling, MinHash, SimHash, language-ID heuristics, quality scoring,
  * token counting, document fingerprinting. All pure, deterministic
  * functions designed to run inside typed `Dataset` transforms (map-side,
  * no driver involvement, no shuffle of their own).
  */
object TextFeatures extends Serializable {

  // ---- hashing ---------------------------------------------------------
  /** 64-bit splitmix — stable across JVMs (unlike String.hashCode at 32
    * bits + collision-prone; we need 64-bit for shingle space).
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-16 chars, then mixed — deterministic string hash. */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  // ---- shingling -------------------------------------------------------
  /** Distinct hashed token n-gram shingles of `text`. */
  def shingles(tokens: Array[String], n: Int): Array[Long] = {
    if (tokens.length < n) {
      if (tokens.isEmpty) Array.empty
      else Array(hashString(tokens.mkString(" ")))
    } else {
      val out = new mutable.HashSet[Long]
      var i = 0
      while (i + n <= tokens.length) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + n) {
          val t = tokens(j)
          var c = 0
          while (c < t.length) { h ^= t.charAt(c); h *= 0x100000001b3L; c += 1 }
          h ^= ' '; h *= 0x100000001b3L
          j += 1
        }
        out += mix64(h)
        i += 1
      }
      out.toArray
    }
  }

  // ---- MinHash ---------------------------------------------------------
  /** k-permutation MinHash signature over hashed shingles. Permutation i
    * is x → mix64(x ^ seed_i) — a fixed bijective-ish rehash; min over the
    * set approximates Jaccard.
    */
  def minHash(shingleHashes: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val x = shingleHashes(i)
      var p = 0
      while (p < k) {
        val v = mix64(x ^ (0x9e3779b97f4a7c15L * (p + 1)))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: signature split into `bands` bands of `rows` rows; a
    * pair colliding in ≥1 band becomes a candidate.
    */
  def bandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) {
        h ^= sig(b * rows + r)
        h *= 0x100000001b3L
        r += 1
      }
      out(b) = mix64(h)
      b += 1
    }
    out
  }

  /** Exact Jaccard of two shingle-hash sets. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    val inter = b.count(sa.contains)
    val union = sa.size + b.toSet.size - inter
    inter.toDouble / union
  }

  // ---- SimHash ---------------------------------------------------------
  /** 64-bit SimHash over tokens weighted by tf. */
  def simHash(tokens: Array[String]): Long = {
    if (tokens.isEmpty) return 0L
    val acc = new Array[Int](64)
    val tf = new mutable.HashMap[String, Int]
    tokens.foreach(t => tf.update(t, tf.getOrElse(t, 0) + 1))
    tf.foreach { case (t, w) =>
      val h = hashString(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash LSH: split 64 bits into 4 × 16-bit chunks; near-dups within
    * hamming ≤ 3 collide on ≥1 chunk (pigeonhole).
    */
  def simHashChunks(h: Long): Array[Long] =
    Array.tabulate(4)(c => (c.toLong << 32) | ((h >>> (c * 16)) & 0xffffL))

  // ---- language ID (n-gram/stopword heuristic) ---------------------------
  private val StopWords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "a"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu", "den"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que", "pour"),
    "es" -> Set("el", "la", "los", "las", "es", "un", "una", "que", "por", "con", "para"),
    "ru" -> Set("и", "в", "не", "на", "что", "это", "как", "я", "с", "по")
  )

  /** Heuristic language ID: script detection first (Cyrillic/Han), then
    * stopword-hit voting over the latin candidates; "und" (undetermined)
    * when nothing scores.
    */
  def langId(tokens: Array[String]): String = {
    if (tokens.isEmpty) return "und"
    var cyr = 0; var han = 0; var latin = 0
    tokens.foreach { t =>
      if (t.nonEmpty) {
        val cp = t.codePointAt(0)
        val block = Character.UnicodeBlock.of(cp)
        if (block == Character.UnicodeBlock.CYRILLIC) cyr += 1
        else if (block == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS) han += 1
        else if (cp < 0x250) latin += 1
      }
    }
    if (cyr * 2 > tokens.length) return "ru"
    if (han * 2 > tokens.length) return "zh"
    val tokSet = tokens.toSet
    val scores = StopWords.map { case (lang, sw) => lang -> sw.count(tokSet.contains) }
    val (best, hits) = scores.maxBy { case (l, h) => (h, l) }
    if (hits == 0) { if (latin > 0) "und" else "und" } else best
  }

  // ---- quality scoring ---------------------------------------------------
  final case class Quality(
      n_chars: Int,
      n_tokens: Int,
      mean_token_len: Double,
      stopword_ratio: Double,
      digit_ratio: Double,
      punct_ratio: Double,
      max_repeat_ratio: Double
  )

  /** Length/punct/stopword heuristics à la C4/Gopher quality filters. */
  def quality(text: String, tokens: Array[String]): Quality = {
    val nChars = text.length
    val nTok = tokens.length
    val meanLen = if (nTok == 0) 0.0 else tokens.map(_.length).sum.toDouble / nTok
    val sw = StopWords("en")
    val swRatio = if (nTok == 0) 0.0 else tokens.count(sw.contains).toDouble / nTok
    var digits = 0; var punct = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isDigit(c)) digits += 1
      else if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) punct += 1
      i += 1
    }
    val digitRatio = if (nChars == 0) 0.0 else digits.toDouble / nChars
    val punctRatio = if (nChars == 0) 0.0 else punct.toDouble / nChars
    val maxRepeat =
      if (nTok == 0) 0.0
      else {
        val tf = new mutable.HashMap[String, Int]
        tokens.foreach(t => tf.update(t, tf.getOrElse(t, 0) + 1))
        tf.values.max.toDouble / nTok
      }
    Quality(nChars, nTok, meanLen, swRatio, digitRatio, punctRatio, maxRepeat)
  }

  // ---- token counting ----------------------------------------------------
  /** Whitespace token count. */
  def wsTokenCount(text: String): Int =
    if (text == null || text.trim.isEmpty) 0
    else text.trim.split("\\s+").length

  /** BPE-ish subword count: alphanumeric runs contribute ceil(len/4)
    * subwords (≈ GPT-style 4-chars-per-token heuristic), other
    * non-space chars 1 each — a cheap deterministic stand-in for a real
    * tokenizer's count, good enough for budget estimation at scale.
    */
  def bpeishTokenCount(text: String): Int = {
    if (text == null) return 0
    var count = 0
    var runLen = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) runLen += 1
      else {
        if (runLen > 0) { count += (runLen + 3) / 4; runLen = 0 }
        if (!Character.isWhitespace(c)) count += 1
      }
      i += 1
    }
    if (runLen > 0) count += (runLen + 3) / 4
    count
  }

  // ---- repetition (Gopher-style quality signals) --------------------------
  /** Per-doc n-gram repetition stats (Rae et al. 2021 "Gopher" repetition
    * filters, public methodology): returns (maxBigramCount, totalBigrams,
    * distinctTrigrams, totalTrigrams). Callers derive
    * top-bigram-fraction = max/total and duplicate-trigram-fraction =
    * 1 − distinct/total — the two signals that catch boilerplate/spam
    * pages ordinary length/stopword filters miss. One pass, two bounded
    * hash maps; map-side only.
    */
  def repetition(tokens: Array[String]): (Long, Long, Long, Long) = {
    val n = tokens.length
    if (n < 3) return (0L, 0L, 0L, 0L)
    val big = new java.util.HashMap[Long, Int]()
    var maxBig = 0
    var i = 0
    while (i < n - 1) {
      val h = mix64(hashString(tokens(i)) * 31 + hashString(tokens(i + 1)))
      val c = big.merge(h, 1, (a, b) => a + b)
      if (c > maxBig) maxBig = c
      i += 1
    }
    val tri = new java.util.HashSet[Long]()
    i = 0
    while (i < n - 2) {
      tri.add(mix64(mix64(hashString(tokens(i)) * 31 + hashString(tokens(i + 1))) * 31 +
        hashString(tokens(i + 2))))
      i += 1
    }
    (maxBig.toLong, (n - 1).toLong, tri.size.toLong, (n - 2).toLong)
  }

  // ---- fingerprinting ----------------------------------------------------
  /** Order-sensitive rolling polynomial fingerprint over tokens (doc
    * identity under exact token sequence; differs from SimHash which is
    * order-insensitive).
    */
  def fingerprint(tokens: Array[String]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < tokens.length) {
      h = h * 0x100000001b3L + hashString(tokens(i))
      i += 1
    }
    mix64(h)
  }
}
