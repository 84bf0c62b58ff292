package graft.sources

import java.nio.charset.StandardCharsets

/** Deterministic html wrap/extract pair for the `pages` table.
  *
  * The generator wraps `text` in a minimal html envelope; the extractor
  * recovers `text` **byte-identically** (the per-row invariant from
  * BASELINE.json input_hint — ≙ the reference's lossless record parse,
  * `LgpReader.cs:102-176`, where every source field round-trips into the
  * typed row). The html body escapes &, <, > so arbitrary text survives,
  * and paragraphs (split on '\n') become <p> elements.
  */
object HtmlText extends Serializable {

  private def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  def wrap(url: String, text: String): Array[Byte] = {
    val paras = text.split("\n", -1).map(p => s"<p>${escape(p)}</p>").mkString
    val html =
      s"<html><head><title>${escape(url)}</title></head><body>$paras</body></html>"
    html.getBytes(StandardCharsets.UTF_8)
  }

  /** Extract the text payload byte-identically (inverse of [[wrap]]).
    *
    * Single left-to-right scan: the original `split("</p>", -1)` compiled
    * a regex per call and `unescape` made three full replace passes —
    * together ~10% of measured build CPU. The scan is output-equivalent:
    * the three entities start with '&' and have distinct tails, and the
    * single characters they decode to can never assemble a new entity, so
    * one pass with first-match-wins equals the sequential replaces. The
    * per-row `extract == text` build invariant guards this at runtime.
    */
  def extract(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val bodyStart = s.indexOf("<body>") + "<body>".length
    val bodyEnd = s.lastIndexOf("</body>")
    if (bodyStart < "<body>".length || bodyEnd < 0) return ""
    val sb = new java.lang.StringBuilder(bodyEnd - bodyStart)
    var segStart = bodyStart
    var firstSeg = true
    var more = true
    while (more) {
      var segEnd = s.indexOf("</p>", segStart)
      if (segEnd < 0 || segEnd + 4 > bodyEnd) { segEnd = bodyEnd; more = false }
      if (segEnd > segStart) { // raw segment non-empty (matches filter(_.nonEmpty))
        if (!firstSeg) sb.append('\n')
        firstSeg = false
        var i = segStart
        // stripPrefix("<p>")
        if (i + 3 <= segEnd && s.charAt(i) == '<' && s.charAt(i + 1) == 'p' && s.charAt(i + 2) == '>')
          i += 3
        while (i < segEnd) {
          val c = s.charAt(i)
          if (c == '&') {
            if (i + 4 <= segEnd && s.charAt(i + 1) == 'l' && s.charAt(i + 2) == 't' && s.charAt(i + 3) == ';') {
              sb.append('<'); i += 4
            } else if (i + 4 <= segEnd && s.charAt(i + 1) == 'g' && s.charAt(i + 2) == 't' && s.charAt(i + 3) == ';') {
              sb.append('>'); i += 4
            } else if (i + 5 <= segEnd && s.charAt(i + 1) == 'a' && s.charAt(i + 2) == 'm' &&
              s.charAt(i + 3) == 'p' && s.charAt(i + 4) == ';') {
              sb.append('&'); i += 5
            } else { sb.append(c); i += 1 }
          } else { sb.append(c); i += 1 }
        }
      }
      segStart = segEnd + 4
    }
    sb.toString
  }
}
