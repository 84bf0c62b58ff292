package graft.index

/** Typed filter-context predicate over the doc attributes the index
  * sidecar carries (lang keyword, warc_ts date) — the vocabulary of the
  * reference's ES filter clauses (`ElasticSearchStorage.cs:208-233`:
  * keyword `term`/`terms`, date `range`, `bool` combinations). Typed
  * (not a Spark Column) so the WAND task can evaluate it node-locally
  * against the slice sidecar with no Spark plan participation at all.
  */
sealed trait AttrPred extends Serializable

object AttrPred {
  /** ES `terms` filter on the lang keyword. */
  final case class LangIn(langs: Set[String]) extends AttrPred
  /** ES `range` filter on warc_ts: [fromMs, untilMs) epoch millis. */
  final case class TsRange(fromMs: Long, untilMs: Long) extends AttrPred
  final case class And(ps: Seq[AttrPred]) extends AttrPred
  final case class Or(ps: Seq[AttrPred]) extends AttrPred
  final case class Not(p: AttrPred) extends AttrPred

  def lang(l: String): AttrPred = LangIn(Set(l))
  def tsRange(from: java.sql.Timestamp, until: java.sql.Timestamp): AttrPred =
    TsRange(from.getTime, until.getTime)
}
