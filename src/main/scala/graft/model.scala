package graft

import java.sql.Timestamp

/** Core fixed schemas (SURVEY.md §1.3: fixed, code-defined schema like the
  * reference's 24-column `EventLogItem`, `OneSTools.EventLog/EventLogItem.cs:5-31`).
  * All tables are typed `Dataset[T]` over these case classes.
  */

/** Primary input row — Iceberg-style `pages` table per BASELINE.json
  * input_hint: (url, warc_ts, html, text, lang). `html` is the opaque
  * binary payload; the extractor must recover `text` byte-identically.
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Document dimension after docID assignment (≙ the reference's monotonic
  * Id assignment, `EventLogReader.cs:105-106`, but deterministic from url
  * sort rank so it is parallelism-independent).
  */
final case class Doc(
    doc_id: Long,
    url: String,
    warc_ts: Timestamp,
    lang: String,
    doc_len: Int
)

/** One analyzed term occurrence aggregate: term frequency of `term` in
  * doc `doc_id` (tf computed map-side per document, no shuffle).
  */
final case class TermDoc(term: String, doc_id: Long, tf: Int, doc_len: Int)

/** One compressed posting block: up to `count` docIDs with aligned tf,
  * doc-length, and (optional) position streams, plus block-max metadata
  * for block-max WAND (≙ ClickHouse sparse-index granularity
  * `index_granularity=8192`, `ClickHouseStorage.cs:182`, reimagined as
  * per-block score bounds).
  *
  * `deltas` is BASE-RELATIVE: it holds only the count−1 gaps between
  * consecutive docIDs — the first docID is the `doc_id_min` column, so a
  * segment merge remaps a block to a new docID space by updating columns
  * only (never decoding payloads).
  *
  * Score bounds, two forms:
  *   - `max_impact` = max over the block of tf/(tf + k1*(1−b+b·dl/avgdl))
  *     at the BUILD-time avgdl — exact; valid only while queries use that
  *     same avgdl (single-segment search).
  *   - `max_tf`/`min_dl` — avgdl-INDEPENDENT: impact is monotone ↑tf, ↓dl,
  *     so impact(max_tf, min_dl, a) bounds every posting in the block for
  *     ANY avgdl a. Multi-segment search (global avgdl ≠ each segment's)
  *     derives its bounds from these.
  *
  * `poss` concatenates per-posting position chunks (Codec.encodePosChunk;
  * boundaries implied by the tf stream); empty when the index is built
  * with positions=false. ES indexes positions on text fields by default
  * (`ElasticSearchStorage.cs:217,227,231` declares analyzed text), so our
  * default matches.
  *
  * `slice` is the doc-range salt bucket: hot (Zipf-head) terms are split
  * across slices so no single shuffle partition receives a whole hot
  * term's postings (explicit skew handling per the north rule).
  */
final case class PostingRow(
    grp: Int,
    slice: Int,
    term: String,
    block_id: Int,
    doc_id_min: Long,
    doc_id_max: Long,
    count: Int,
    deltas: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    poss: Array[Byte],
    tf_sum: Long,
    max_impact: Double,
    max_tf: Int,
    min_dl: Int
)

/** Per-term dictionary entry (doc_freq drives idf). */
final case class TermStat(term: String, doc_freq: Long, total_tf: Long)

/** Corpus-level stats needed by BM25 (N, avgdl). */
final case class CorpusStats(n_docs: Long, avg_dl: Double, total_tokens: Long)

/** Per-partition build lineage + metrics (≙ the reference's sink-stored
  * checkpoint `EventLogPosition.cs:3-17`, generalized to per-partition
  * manifest rows; SURVEY.md §2.9 T5/T6).
  */
final case class BuildMetric(
    grp: Int,
    partition_id: Int,
    terms: Long,
    postings: Long,
    blocks: Long,
    bytes: Long,
    status: String
)

/** A document analyzed once, map-side: doc_len + per-term tf. */
final case class AnalyzedDoc(
    doc_id: Long,
    url: String,
    warc_ts: Timestamp,
    lang: String,
    doc_len: Int,
    tfs: Map[String, Int]
)

/** A scored search hit. */
final case class Hit(doc_id: Long, score: Double)
