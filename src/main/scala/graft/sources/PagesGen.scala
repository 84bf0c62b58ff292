package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Page

/** Deterministic seeded generator for the Common-Crawl-style `pages`
  * table (FIXTURES.md §1): `(url, warc_ts, html, text, lang)`.
  *
  * - Distributed: built from `spark.range(n)` — each row is a pure
  *   function of its index, so generation scales linearly with cores and
  *   never funnels through the driver (design point for the 10^12-doc
  *   target: the generator is a stand-in for an Iceberg snapshot scan).
  * - Zipf-distributed tokens over a ~5k-word vocabulary → realistic
  *   hot-term skew (exercises the skew handling the north rule demands).
  * - Injected rare terms with known df (`rareterm7`, …) for hand-checked
  *   BM25 cases; empty and whitespace-only docs; Cyrillic rows
  *   (≙ the reference's Russian payloads, `LgpReader.cs:222-232`);
  *   duplicate text across distinct urls (docID tie-break tests).
  * - warc_ts spans > 3 months so time-bucket partitioning (≙ per-hour/
  *   day/month ES index routing, `ElasticSearchStorage.cs:293-320`) is
  *   exercised.
  */
object PagesGen extends Serializable {

  val VocabSize = 5000
  private val BaseEpochMs = 1609459200000L // 2021-01-01T00:00:00Z

  /** xorshift64* — deterministic, splittable by seeding with row index. */
  @inline private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** word id for the j-th token of doc i: Zipf(s≈1.1) over VocabSize via
    * inverse-CDF approximation (power of a uniform).
    */
  @inline private def zipfWord(r: Long): Int = {
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
    // inverse CDF of a power-law rank distribution
    val rank = math.pow(u, 3.0) * VocabSize
    math.min(VocabSize - 1, rank.toInt)
  }

  private def word(id: Int): String = s"w$id"

  def textFor(i: Long): String = {
    val h = mix(i)
    (i % 97) match {
      case 13 => "" // empty doc
      case 29 => "   \t  " // whitespace-only
      case 41 => // Cyrillic + combining chars
        val n = 5 + (h & 7).toInt
        (0 until n).map(j => if ((j % 3) == 0) "привет" else "мир").mkString(" ")
      case 53 => textFor(i - 1) // duplicate of previous doc's text
      case _ =>
        val len = 20 + (mix(h) % 180).toInt.abs
        val sb = new StringBuilder(len * 6)
        var j = 0
        while (j < len) {
          if (j > 0) sb.append(if (j % 17 == 0) '\n' else ' ')
          sb.append(word(zipfWord(mix(h ^ (j * 0x5851f42dL)))))
          j += 1
        }
        // injected rare terms with known df: doc i gets rareterm{i%1009}
        // iff i % 101 == 7 (df ≈ n/101 spread over 1009 distinct terms)
        if (i % 101 == 7) sb.append(" rareterm").append(i % 1009)
        sb.toString
    }
  }

  def pageFor(i: Long, nSites: Int = 50): Page = {
    val url = s"https://site${i % nSites}.example/p/$i"
    val ts = new Timestamp(BaseEpochMs + i * 97000L % (120L * 86400000L) + i * 1000L)
    val text = textFor(i)
    val lang = (i % 23) match {
      case 3 => "ru"; case 7 => "de"; case _ => "en"
    }
    Page(url, ts, HtmlText.wrap(url, text), text, lang)
  }

  /** Generate n pages as a typed Dataset, `parallelism` input partitions. */
  def pages(spark: SparkSession, n: Long, parallelism: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, parallelism).map(i => pageFor(i))
  }
}
