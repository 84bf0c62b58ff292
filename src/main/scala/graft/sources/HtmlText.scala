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

  /** Extract the text payload byte-identically (inverse of [[wrap]]). */
  def extract(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val bodyStart = s.indexOf("<body>") + "<body>".length
    val bodyEnd = s.lastIndexOf("</body>")
    if (bodyStart < "<body>".length || bodyEnd < 0) return ""
    val body = s.substring(bodyStart, bodyEnd)
    // paragraphs back to '\n'-joined text
    val parts = body.split("</p>", -1).filter(_.nonEmpty).map { p =>
      unescape(p.stripPrefix("<p>"))
    }
    parts.mkString("\n")
  }
}
