package graft.index

/** Typed filter-context predicate over the doc attributes the index
  * sidecar carries — the vocabulary of the reference's ES filter clauses
  * (`ElasticSearchStorage.cs:208-233`: keyword `term`/`terms` on any of
  * its ~10 provisioned keyword fields, `range` on date/numeric fields,
  * `bool` combinations). Typed (not a Spark Column) so the WAND task can
  * evaluate it node-locally against the slice sidecar with no Spark plan
  * participation at all.
  *
  * Fields are named: the sidecar is schema-driven ([[AttrSchema]]), so
  * [[AttrPred.KeyIn]] works on ANY declared keyword field and
  * [[AttrPred.NumRange]] on any declared numeric field — filtering on
  * User/Computer/Severity-style attributes runs the same zero-exchange
  * path as lang/date. An undeclared field name fails loudly at cursor
  * open, never silently matches.
  */
sealed trait AttrPred extends Serializable

object AttrPred {
  /** ES `terms` filter on a declared keyword field. */
  final case class KeyIn(field: String, values: Set[String]) extends AttrPred
  /** ES `range` filter on a declared numeric field: [lo, hi). */
  final case class NumRange(field: String, lo: Long, hi: Long) extends AttrPred
  final case class And(ps: Seq[AttrPred]) extends AttrPred
  final case class Or(ps: Seq[AttrPred]) extends AttrPred
  final case class Not(p: AttrPred) extends AttrPred

  // ---- r3-compat sugar (lang + warc_ts were the only fields then) -----
  def LangIn(langs: Set[String]): AttrPred = KeyIn("lang", langs)
  def TsRange(fromMs: Long, untilMs: Long): AttrPred = NumRange("warc_ts", fromMs, untilMs)

  def lang(l: String): AttrPred = KeyIn("lang", Set(l))
  def tsRange(from: java.sql.Timestamp, until: java.sql.Timestamp): AttrPred =
    NumRange("warc_ts", from.getTime, until.getTime)
}

/** One declared sidecar attribute: `kind` ∈ {kw, num}; `sql` is the Spark
  * SQL expression deriving it from the index's docs table (doc_id, url,
  * warc_ts, lang, doc_len). Stored in the index meta (so merges can
  * regenerate the sidecar) AND in each sidecar footer (self-describing
  * files). Keyword fields are per-slice dictionary-coded — intended for
  * bounded-cardinality attributes, exactly like ES keyword doc values
  * (a unique-per-doc keyword belongs in the docs table, not here).
  */
final case class AttrSpec(name: String, kind: String, sql: String) {
  require(kind == AttrSchema.Kw || kind == AttrSchema.Num, s"bad attr kind: $kind")
}

object AttrSchema {
  val Kw = "kw"
  val Num = "num"

  /** Everything the fixed docs schema carries that is filter-shaped. */
  val Default: Seq[AttrSpec] = Seq(
    AttrSpec("lang", Kw, "lang"),
    AttrSpec("warc_ts", Num, "unix_millis(warc_ts)"),
    AttrSpec("doc_len", Num, "CAST(doc_len AS BIGINT)")
  )
}
