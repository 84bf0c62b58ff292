package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first dedup pass of
  * every web-crawl pipeline (CCNet/RefinedWeb dedup by normalized URL
  * before any content pass; the rules below are the standard public
  * ones). Everything is codegen column expressions (regexp/split/sort) —
  * no UDF, pure map stage; the dedup is one hash aggregation on the
  * canonical string.
  *
  * Rules (deterministic, documented, auditor-reproducible):
  *   1. drop the fragment (`#…`);
  *   2. lowercase scheme and host (path/query stay case-sensitive);
  *   3. drop tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`);
  *   4. sort the surviving query parameters (param order is not
  *      semantic); drop the `?` if none survive.
  * Default-port stripping and percent-encoding normalization are out of
  * scope (documented — they need a real URL parser, not a regex).
  */
object UrlOps {

  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val schemeHost = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    val canonBase = concat(lower(schemeHost),
      base.substr(length(schemeHost) + 1, length(base)))
    val params = filter(split(query, "&"),
      p => !p.rlike(TrackingRe) && p =!= "")
    val sorted = array_join(array_sort(params), "&")
    when(sorted === "", canonBase).otherwise(concat(canonBase, lit("?"), sorted))
  }

  /** URL-level dedup: (canon_url, keep_id, n_dups) — keep the smallest
    * id per canonical URL (the deterministic CCNet keep rule).
    */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), canonicalize(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
