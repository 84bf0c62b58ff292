package graft.functions

/** HdrHistogram-style logarithmic value buckets (Gene Tene's public
  * HdrHistogram design): exact unit buckets below 2^(s+1), then
  * power-of-two ranges each split into 2^s sub-buckets — relative error
  * ≤ 2^-s, bucket COUNT ≤ ~(64−s)·2^s regardless of the value range.
  * Order-independent and exactly mergeable (bucket counts just add),
  * unlike t-digest whose centroids depend on merge order — that property
  * is what lets a DuckDB oracle recompute the sketch bit-for-bit.
  * Non-negative values only (declared numeric doc values: lengths,
  * ports, epoch millis), loud otherwise.
  */
object LogBuckets {

  /** Monotone bucket index of v at sub-bucket resolution 2^s. */
  def bucketOf(v: Long, s: Int): Long = {
    require(v >= 0, s"log buckets take non-negative values, got $v")
    val base = 1L << (s + 1)
    if (v < base) v
    else {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(v) // bit length
      val shift = bits - (s + 1) // ≥ 1
      shift.toLong * (1L << s) + (v >> shift) // (v >> shift) ∈ [2^s, 2^(s+1))
    }
  }

  /** Smallest value mapping to bucket `idx` (the reported representative
    * — a deterministic lower bound, error ≤ 2^-s relative).
    */
  def lowerBound(idx: Long, s: Int): Long = {
    val base = 1L << (s + 1)
    if (idx < base) idx
    else {
      val shift = (idx >> s) - 1
      val m = idx - shift * (1L << s)
      m << shift
    }
  }

  /** DuckDB expression computing [[bucketOf]] of SQL column `col` —
    * kept HERE next to the Scala so the two sides cannot drift.
    * `len(bin(v))` is the integer bit length.
    */
  def bucketSql(col: String, s: Int): String = {
    val base = 1L << (s + 1)
    val sub = 1L << s
    s"""CASE WHEN $col < $base THEN $col
        ELSE (len(bin($col::BIGINT)) - ${s + 1})::BIGINT * $sub + ($col >> (len(bin($col::BIGINT)) - ${s + 1})) END"""
  }

  /** DuckDB expression for [[lowerBound]] of a bucket-index column. */
  def lowerBoundSql(col: String, s: Int): String = {
    val base = 1L << (s + 1)
    val sub = 1L << s
    s"""CASE WHEN $col < $base THEN $col
        ELSE ($col - (($col // $sub) - 1) * $sub) << (($col // $sub) - 1) END"""
  }
}
