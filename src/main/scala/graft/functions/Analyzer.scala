package graft.functions

import java.util.Locale
import scala.collection.mutable

/** ES-standard-analyzer-compatible tokenizer: UAX#29-style word
  * segmentation + lowercase. The reference declares `text` fields analyzed
  * by Elasticsearch's standard analyzer (no custom analyzer in the index
  * template, `ElasticSearchStorage.cs:200-236`) — i.e. Lucene
  * StandardTokenizer (Unicode word break) + LowerCaseFilter.
  *
  * We implement the word-break subset explicitly (the JDK BreakIterator is
  * not UAX#29-conformant — it keeps "a-b" together), with these rules:
  *   - token chars: Unicode letters and digits (incl. marks following
  *     letters, so combining sequences survive);
  *   - ExtendNumLet ('_'): always joins (WB13a/b) — "c_d" is one token;
  *   - MidNumLet ('.', ''', '’'): joins letter·letter and digit·digit
  *     (WB6/7, WB11/12) — "three.four", "3.14", "o'neil" are one token;
  *   - MidLetter (':', '·'): joins letters; MidNum (',', ';'): joins
  *     digits — "1,024" is one token;
  *   - everything else (hyphen, space, punctuation) splits — "a-b" → a, b.
  *
  * Used inside `Dataset.flatMap`/`mapPartitions` (SURVEY.md §2.10: the
  * tokenizer is one of the two genuine UDF-ish hot spots; typed flatMap
  * keeps it out of Catalyst only where unavoidable).
  */
object Analyzer extends Serializable {

  @inline private def isTokenChar(cp: Int): Boolean =
    Character.isLetterOrDigit(cp) ||
      Character.getType(cp) == Character.NON_SPACING_MARK ||
      Character.getType(cp) == Character.COMBINING_SPACING_MARK ||
      cp == '_'

  @inline private def isMidLetter(cp: Int): Boolean =
    cp == ':' || cp == '·' || cp == '.' || cp == '\'' || cp == '’'

  @inline private def isMidNum(cp: Int): Boolean =
    cp == ',' || cp == ';' || cp == '.' || cp == '\'' || cp == '’'

  /** Tokenize to lowercase word tokens per the rules above. */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (start < 0) start = i
        i += w
      } else if (
        start >= 0 && i + w < n && {
          // mid-character: joins iff surrounded by compatible token chars
          val next = text.codePointAt(i + w)
          val prev = text.codePointBefore(i)
          (isMidLetter(cp) && Character.isLetter(prev) && Character.isLetter(next)) ||
          (isMidNum(cp) && Character.isDigit(prev) && Character.isDigit(next))
        }
      ) {
        i += w // joiner — stay inside the token
      } else {
        if (start >= 0) { emit(out, text, start, i); start = -1 }
        i += w
      }
    }
    if (start >= 0) emit(out, text, start, n)
    out.toArray
  }

  /** Tokenize keeping each token's [start, end) char offsets in the
    * ORIGINAL text — the highlighter's primitive (fragments must quote
    * the source text, not the normalized tokens). Same state machine as
    * [[tokenize]], duplicated rather than shared so the index-build hot
    * path keeps its allocation-free shape; agreement is property-tested
    * (tokens of both functions must be identical on any input).
    */
  def tokenizeWithOffsets(text: String): (Array[String], Array[Int], Array[Int]) = {
    if (text == null || text.isEmpty)
      return (Array.empty, Array.empty, Array.empty)
    val toks = mutable.ArrayBuffer.empty[String]
    val starts = mutable.ArrayBuffer.empty[Int]
    val ends = mutable.ArrayBuffer.empty[Int]
    def emitAt(start: Int, end: Int): Unit = {
      val before = toks.length
      emit(toks, text, start, end)
      if (toks.length > before) { starts += start; ends += end }
    }
    val n = text.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (start < 0) start = i
        i += w
      } else if (
        start >= 0 && i + w < n && {
          val next = text.codePointAt(i + w)
          val prev = text.codePointBefore(i)
          (isMidLetter(cp) && Character.isLetter(prev) && Character.isLetter(next)) ||
          (isMidNum(cp) && Character.isDigit(prev) && Character.isDigit(next))
        }
      ) {
        i += w
      } else {
        if (start >= 0) { emitAt(start, i); start = -1 }
        i += w
      }
    }
    if (start >= 0) emitAt(start, n)
    (toks.toArray, starts.toArray, ends.toArray)
  }

  /** Emit a token iff it contains at least one letter or digit (drops
    * joiner-only runs like "___").
    */
  @inline private def emit(
      out: mutable.ArrayBuffer[String], text: String, start: Int, end: Int
  ): Unit = {
    var j = start
    var hasAlnum = false
    while (j < end && !hasAlnum) {
      val c = text.codePointAt(j)
      if (Character.isLetterOrDigit(c)) hasAlnum = true
      j += Character.charCount(c)
    }
    if (hasAlnum) out += text.substring(start, end).toLowerCase(Locale.ROOT)
  }

  /** Token count only — the tokenize state machine without materializing
    * token strings (no substring/lowercase/buffer allocations). Used for
    * `doc_len` in the staging pass, where the full token list is never
    * needed; must equal `tokenize(text).length` exactly (property-tested).
    */
  def tokenCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var count = 0
    val n = text.length
    var i = 0
    var start = -1
    var hasAlnum = false
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (start < 0) { start = i; hasAlnum = false }
        if (!hasAlnum && Character.isLetterOrDigit(cp)) hasAlnum = true
        i += w
      } else if (
        start >= 0 && i + w < n && {
          val next = text.codePointAt(i + w)
          val prev = text.codePointBefore(i)
          (isMidLetter(cp) && Character.isLetter(prev) && Character.isLetter(next)) ||
          (isMidNum(cp) && Character.isDigit(prev) && Character.isDigit(next))
        }
      ) {
        i += w
      } else {
        if (start >= 0) { if (hasAlnum) count += 1; start = -1 }
        i += w
      }
    }
    if (start >= 0 && hasAlnum) count += 1
    count
  }

  /** Receiver for [[scanTokens]]: one call per emitted token. `ascii` is
    * true iff every char of the span is < 0x80 — the caller's license to
    * lowercase with the trivial 'A'..'Z' map instead of Locale rules.
    * When `ascii`, `hash` is the String.hashCode of the LOWERCASED span
    * (computed during the scan, which touches every char anyway — callers
    * probing a hash table off the span need no second pass); undefined
    * when `ascii` is false.
    */
  trait TokenSink {
    def token(text: String, start: Int, end: Int, index: Int, ascii: Boolean, hash: Int): Unit
  }

  /** Streaming tokenizer: the [[tokenize]] state machine without
    * materializing token strings — `sink.token` receives each emitted
    * token's [start, end) char span (original text, NOT lowercased) and
    * its token index; returns the total token count. Token set, order and
    * spans are identical to [[tokenizeWithOffsets]] (property-tested);
    * `tokenize(text)(i) == lowercase(text.substring(start_i, end_i))`.
    * This is the index build's hot loop (guide §1.2 step 2): the fused
    * chunk combine probes its term table straight off the span, so the
    * ~tokens-per-corpus String allocations of the tokenize() path never
    * happen.
    */
  def scanTokens(text: String, sink: TokenSink): Int = {
    if (text == null || text.isEmpty) return 0
    var count = 0
    val n = text.length
    var i = 0
    var start = -1
    var hasAlnum = false
    var ascii = true
    var hash = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenChar(cp)) {
        if (start < 0) { start = i; hasAlnum = false; ascii = true; hash = 0 }
        if (cp >= 0x80) ascii = false
        else hash = hash * 31 + (if (cp >= 'A' && cp <= 'Z') cp + 32 else cp)
        if (!hasAlnum && Character.isLetterOrDigit(cp)) hasAlnum = true
        i += w
      } else if (
        start >= 0 && i + w < n && {
          val next = text.codePointAt(i + w)
          val prev = text.codePointBefore(i)
          (isMidLetter(cp) && Character.isLetter(prev) && Character.isLetter(next)) ||
          (isMidNum(cp) && Character.isDigit(prev) && Character.isDigit(next))
        }
      ) {
        if (cp >= 0x80) ascii = false
        else hash = hash * 31 + cp // ASCII joiners have no case
        i += w
      } else {
        if (start >= 0) {
          if (hasAlnum) { sink.token(text, start, i, count, ascii, hash); count += 1 }
          start = -1
        }
        i += w
      }
    }
    if (start >= 0 && hasAlnum) { sink.token(text, start, n, count, ascii, hash); count += 1 }
    count
  }

  /** Per-document term frequencies in one map-side pass (no shuffle):
    * tokenize then count — the "operator fusion" the reference hand-codes
    * (`LgpReader.cs:102-176`) that whole-stage codegen / typed flatMap
    * gives us per task.
    */
  /** Per-document term → sorted token positions, one map-side pass
    * (positions are 0-based token indexes in the analyzed stream — what
    * Lucene records for text fields by default, enabling phrase queries).
    */
  def termPositions(text: String): (Int, Array[(String, Array[Int])]) = {
    val toks = tokenize(text)
    if (toks.isEmpty) return (0, Array.empty)
    val m = new mutable.AnyRefMap[String, mutable.ArrayBuffer[Int]](math.min(toks.length, 64))
    var i = 0
    while (i < toks.length) {
      m.getOrElseUpdate(toks(i), new mutable.ArrayBuffer[Int](2)) += i
      i += 1
    }
    (toks.length, m.iterator.map { case (t, ps) => (t, ps.toArray) }.toArray)
  }

  def termFreqs(text: String): (Int, Array[(String, Int)]) = {
    val toks = tokenize(text)
    if (toks.isEmpty) return (0, Array.empty)
    // AnyRefMap: open-addressing, no per-entry node allocation (this is
    // the per-doc hot loop of the whole build)
    val m = new mutable.AnyRefMap[String, Int](math.min(toks.length, 64))
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      m.update(t, m.getOrElse(t, 0) + 1)
      i += 1
    }
    (toks.length, m.toArray)
  }
}
