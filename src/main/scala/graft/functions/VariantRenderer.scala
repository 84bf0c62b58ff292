package graft.functions

/** Recursive variant→display-string renderer — the one operator in the
  * reference that genuinely needs a recursive UDF (SURVEY.md §2.2 P9):
  * the 1C "Data" payload is a tagged tree — `R` (reference), `U`
  * (undefined), `S` (string), `B` (boolean), `P` (nested list) — rendered
  * to a human-readable multi-line string with "Item i:" prefixes per
  * nested element and a final trim (`LgpReader.cs:178-220,161`).
  *
  * Catalyst has no recursion, so this runs as a Scala function inside a
  * typed transform / UDF — exactly the extension point the survey calls
  * out (§2.10).
  */
object VariantRenderer extends Serializable {

  sealed trait Variant
  case object U extends Variant // undefined
  final case class R(ref: String) extends Variant // reference
  final case class S(value: String) extends Variant // string
  final case class B(value: Boolean) extends Variant // boolean
  final case class P(items: Seq[Variant]) extends Variant // nested list

  /** Render per the reference's semantics: U → "", scalars → value
    * string, P → one "Item N: <rendered>" line per element (1-based),
    * nested P's lines indented by the parent prefix; outermost result
    * trimmed (≙ `.Trim()` at `LgpReader.cs:161`).
    */
  def render(v: Variant): String = renderNode(v, "").trim

  private def renderNode(v: Variant, indent: String): String = v match {
    case U        => ""
    case R(ref)   => ref
    case S(s)     => s
    case B(b)     => if (b) "true" else "false"
    case P(items) =>
      items.zipWithIndex
        .map { case (item, i) =>
          s"${indent}Item ${i + 1}: ${renderNode(item, indent + "  ")}"
        }
        .mkString("\n")
  }
}
