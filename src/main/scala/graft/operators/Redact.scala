package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for LLM training corpora — the standard pre-training
  * scrub (emails / phone numbers / IP addresses → typed placeholders),
  * public methodology (e.g. the BigScience ROOTS / RefinedWeb pipelines
  * describe exactly this regex family).
  *
  * Everything is `regexp_replace`/`regexp_count` over codegen'd
  * expressions — no UDFs, whole-stage codegen keeps the scan fused; at
  * 100 TB this is a pure map stage with zero shuffle. Patterns are
  * deliberately RE2-compatible (no backreferences/lookarounds) so an
  * external auditor (DuckDB, Trino) can re-run them verbatim.
  *
  * Replacement runs in a FIXED order (email → ipv4 → phone), and each
  * stage's count is taken on that stage's INPUT text, so overlapping
  * matches resolve deterministically (an IP inside an already-redacted
  * email is never double-counted).
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-ish dashed form: +CC-NNN-N… (1-10 trailing digits). */
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{1,10}"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  /** (idCol, redacted, n_email, n_ip, n_phone): placeholders substituted
    * in the fixed stage order above.
    */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0: Column = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, EmailTag)
    val t2 = regexp_replace(t1, Ipv4Re, IpTag)
    val t3 = regexp_replace(t2, PhoneRe, PhoneTag)
    docs.select(
      col(idCol),
      t3.as("redacted"),
      regexp_count(t0, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(t1, lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(t2, lit(PhoneRe)).cast("long").as("n_phone")
    )
  }
}
