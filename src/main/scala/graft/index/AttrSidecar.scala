package graft.index

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import graft.query.DocFilter

/** Slice-aligned doc-attribute sidecar — the engine's rendition of
  * Elasticsearch DOC VALUES for filter context: the reference provisions
  * keyword + date fields NEXT TO the text fields precisely so ranked
  * queries can be predicated cheaply (`ElasticSearchStorage.cs:208-233`);
  * ES evaluates those filters node-locally from columnar doc values.
  *
  * Layout: one file per doc-range slice, `attrs/slice-<s>.bin`, holding
  * every doc of that slice SORTED BY doc_id as interleaved varint records
  * `(doc_id gap, lang code, warc_ts millis zigzag delta)`, with the lang
  * dictionary + doc count in a seekable footer. ~6-10 bytes/doc.
  *
  * Scale shape: a filtered search keeps the EXACT plan of an unfiltered
  * one (single exchange of matched posting blocks by slice). The WAND task
  * opens its own slice's sidecar and streams it as a monotone
  * [[AttrCursor]] (a [[graft.query.DocFilter]]): no per-query doc-id
  * allow-list ever crosses the network — at 10%-selectivity over 10^12
  * docs the old allow-list cogroup shipped ~10^11 ids (>1 TB) per query;
  * this ships zero. Memory is O(1): records decode lazily off a buffered
  * stream, never materialized (the filter cursor is monotone, exactly what
  * WAND's ascending candidate stream needs).
  *
  * Predicates are typed ([[AttrPred]]): keyword-set on lang, range on
  * warc_ts, boolean combinations — the ES filter-context vocabulary. For
  * genuinely ad-hoc predicates over columns the sidecar doesn't carry,
  * `Search.topK(docFilter: Column)` keeps the allow-list path.
  */
object AttrSidecar {

  private val Magic = 0x47415452 // "GATR"
  private val Version = 1

  def attrsDir(indexDir: String) = s"$indexDir/attrs"
  def slicePath(indexDir: String, slice: Int) = s"${attrsDir(indexDir)}/slice-$slice.bin"

  /** Does this index carry the sidecar? (pre-v3 indexes don't). */
  def hasAttrs(indexDir: String): Boolean = {
    val p = new Path(attrsDir(indexDir))
    val fs = p.getFileSystem(new Configuration())
    fs.exists(p)
  }

  // ---- varint I/O (same wire format as functions.Codec) -----------------
  private def writeVar(out: OutputStream, v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  private def readVar(in: InputStream): Long = {
    var shift = 0; var v = 0L; var b = 0
    do {
      b = in.read()
      if (b < 0) throw new java.io.EOFException("attr sidecar truncated")
      v |= (b & 0x7fL) << shift; shift += 7
    } while ((b & 0x80) != 0)
    v
  }
  @inline private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)
  @inline private def varLen(v: Long): Long = {
    var x = v; var l = 1L
    while ((x & ~0x7fL) != 0L) { l += 1; x >>>= 7 }
    l
  }

  /** Write the sidecar for a built index: one job, records shuffled once
    * by slice and sorted by doc_id within (the docs scan is column-pruned
    * to 4 narrow columns). Each task streams its slice runs straight to
    * the filesystem — nothing slice-sized is ever held in memory.
    */
  def writeAttrs(spark: SparkSession, indexDir: String, nSlices: Int): Unit = {
    import spark.implicits._
    val dir = attrsDir(indexDir)
    spark.read.parquet(s"$indexDir/docs")
      .select($"slice".cast("int"), $"doc_id", $"lang", $"warc_ts")
      .as[(Int, Long, String, java.sql.Timestamp)]
      .repartition(nSlices, $"slice")
      .sortWithinPartitions($"slice", $"doc_id")
      .foreachPartition { (it: Iterator[(Int, Long, String, java.sql.Timestamp)]) =>
        // executor-side: default Configuration resolves the cluster's
        // defaultFS from the node's classpath config (file:// locally)
        val fs = new Path(dir).getFileSystem(new Configuration())
        var cur = -1
        var out: DataOutputStream = null
        var dict = scala.collection.mutable.LinkedHashMap.empty[String, Int]
        var n = 0L
        var prevId = 0L
        var prevTs = 0L
        var bodyBytes = 0L
        def closeSlice(): Unit = if (out != null) {
          // footer: lang dict, record count, then a fixed 8-byte pointer
          // to the footer start (readers seek there first)
          val footerAt = 8L + bodyBytes // after magic+version header
          writeVar(out, dict.size.toLong)
          dict.keysIterator.foreach { l =>
            val b = l.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            writeVar(out, b.length.toLong); out.write(b)
          }
          writeVar(out, n)
          out.writeLong(footerAt)
          out.close(); out = null
        }
        it.foreach { case (slice, id, lang, ts) =>
          if (slice != cur) {
            closeSlice()
            cur = slice
            val raw = fs.create(new Path(s"$dir/slice-$slice.bin"), true)
            out = new DataOutputStream(new BufferedOutputStream(raw, 1 << 16))
            out.writeInt(Magic); out.writeInt(Version)
            dict = scala.collection.mutable.LinkedHashMap.empty
            n = 0L; prevId = 0L; prevTs = 0L; bodyBytes = 0L
          }
          val code = dict.getOrElseUpdate(lang, dict.size)
          val tsMs = ts.getTime
          // byte count tracked Long-side (DataOutputStream.size() is an
          // Int and wraps past 2 GiB — real at 10^8-doc slices)
          val gap = if (n == 0) id else id - prevId
          val tsd = zigzag(if (n == 0) tsMs else tsMs - prevTs)
          writeVar(out, gap)
          writeVar(out, code.toLong)
          writeVar(out, tsd)
          bodyBytes += varLen(gap) + varLen(code.toLong) + varLen(tsd)
          prevId = id; prevTs = tsMs; n += 1
        }
        closeSlice()
      }
  }

  /** One slice's footer: lang dictionary + record count. */
  private final case class Footer(langs: Array[String], n: Long, bodyEnd: Long)

  private def readFooter(fs: FileSystem, p: Path): Footer = {
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      in.seek(len - 8)
      val footerAt = in.readLong()
      in.seek(footerAt)
      val buf = new DataInputStream(new BufferedInputStream(in, 1 << 14))
      val nLangs = readVar(buf).toInt
      val langs = Array.tabulate(nLangs) { _ =>
        val l = readVar(buf).toInt
        val b = new Array[Byte](l)
        buf.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      }
      val n = readVar(buf)
      Footer(langs, n, footerAt)
    } finally in.close()
  }

  /** Compile a typed predicate against a slice's lang dictionary → a flat
    * (langCode, tsMillis) test (set membership becomes a boolean array).
    */
  private def compile(pred: AttrPred, langs: Array[String]): (Int, Long) => Boolean =
    pred match {
      case AttrPred.LangIn(set) =>
        val ok = langs.map(set.contains)
        (c, _) => c < ok.length && ok(c)
      case AttrPred.TsRange(fromMs, untilMs) =>
        (_, ts) => ts >= fromMs && ts < untilMs
      case AttrPred.And(ps) =>
        val fs = ps.map(compile(_, langs)).toArray
        (c, ts) => fs.forall(f => f(c, ts))
      case AttrPred.Or(ps) =>
        val fs = ps.map(compile(_, langs)).toArray
        (c, ts) => fs.exists(f => f(c, ts))
      case AttrPred.Not(p) =>
        val f = compile(p, langs)
        (c, ts) => !f(c, ts)
    }

  /** Open a streaming filter cursor over one slice's sidecar. The caller
    * (the WAND task for that slice) MUST close() it. Errors loudly if the
    * file is missing — a slice with posting blocks always has docs, so a
    * missing file means the index predates the sidecar (rebuild or use the
    * Column allow-list path).
    */
  def openCursor(indexDir: String, slice: Int, pred: AttrPred): AttrCursor = {
    val p = new Path(slicePath(indexDir, slice))
    val fs = p.getFileSystem(new Configuration())
    require(fs.exists(p),
      s"attr sidecar missing for slice $slice of $indexDir — index built pre-v${IndexBuilder.FormatVersion}?")
    val footer = readFooter(fs, p)
    val raw = fs.open(p)
    val in = new DataInputStream(new BufferedInputStream(raw, 1 << 16))
    require(in.readInt() == Magic && in.readInt() == Version, s"bad attr sidecar header: $p")
    new AttrCursor(in, footer.n, compile(pred, footer.langs))
  }

  /** Materialized sorted doc-id allow-list for one slice (one streaming
    * pass; memory ∝ matches). Used by the BATCH path, where several
    * queries share one slice task and each needs its own cursor position —
    * re-streaming the file per query would re-decode it Q times.
    */
  def matchingDocIds(indexDir: String, slice: Int, pred: AttrPred): Array[Long] = {
    val c = openCursor(indexDir, slice, pred)
    try {
      val out = new scala.collection.mutable.ArrayBuffer[Long]
      var id = c.ceil(0L)
      while (id != Long.MaxValue) { out += id; id = c.ceil(id + 1) }
      out.toArray
    } finally c.close()
  }

  /** Open a VALUE reader over one slice's sidecar (aggregations: the
    * caller walks ascending matched doc ids and reads each one's
    * attributes — ES doc-values exactly as its aggregation phase uses
    * them). Caller MUST close().
    */
  def openReader(indexDir: String, slice: Int): AttrReader = {
    val p = new Path(slicePath(indexDir, slice))
    val fs = p.getFileSystem(new Configuration())
    require(fs.exists(p),
      s"attr sidecar missing for slice $slice of $indexDir — index built pre-v${IndexBuilder.FormatVersion}?")
    val footer = readFooter(fs, p)
    val raw = fs.open(p)
    val in = new DataInputStream(new BufferedInputStream(raw, 1 << 16))
    require(in.readInt() == Magic && in.readInt() == Version, s"bad attr sidecar header: $p")
    new AttrReader(in, footer.n, footer.langs)
  }

  /** Monotone attribute VALUE cursor: `seek(target)` (ascending targets)
    * positions on the record of `target` and exposes its lang + warc_ts.
    * O(1) memory, strictly-forward decode — same contract as AttrCursor,
    * yielding values instead of a predicate verdict.
    */
  final class AttrReader(
      in: DataInputStream,
      n: Long,
      langs: Array[String]
  ) extends AutoCloseable {
    private var i = 0L
    private var curId = 0L
    private var curTs = 0L
    private var curCode = 0
    private var open = true
    advanceRecord()

    private def advanceRecord(): Unit = {
      if (i >= n) { curId = Long.MaxValue; closeQuietly(); return }
      val gap = readVar(in)
      val code = readVar(in).toInt
      val tsd = unzigzag(readVar(in))
      curId = if (i == 0) gap else curId + gap
      curTs = if (i == 0) tsd else curTs + tsd
      curCode = code
      i += 1
    }

    /** Position on `target`'s record; false if the doc has no record
      * (can't happen for ids that carry postings — defensive).
      */
    def seek(target: Long): Boolean = {
      while (curId < target) advanceRecord()
      curId == target
    }
    def lang: String = langs(curCode)
    def tsMillis: Long = curTs

    private def closeQuietly(): Unit = if (open) { open = false; in.close() }
    def close(): Unit = closeQuietly()
  }

  /** Monotone streaming filter over one slice's attribute records — the
    * [[graft.query.DocFilter]] WAND consumes. Decodes ~3 varints per doc
    * strictly forward; O(1) memory. Targets must be ascending (WAND's
    * candidate stream is).
    */
  final class AttrCursor(
      in: DataInputStream,
      n: Long,
      pred: (Int, Long) => Boolean
  ) extends DocFilter with AutoCloseable {
    private var i = 0L
    private var curId = 0L
    private var curTs = 0L
    private var curOk = false
    private var open = true
    advanceRecord() // position on the first record

    private def advanceRecord(): Unit = {
      if (i >= n) { curId = Long.MaxValue; curOk = false; closeQuietly(); return }
      val gap = readVar(in)
      val code = readVar(in).toInt
      val tsd = unzigzag(readVar(in))
      curId = if (i == 0) gap else curId + gap
      curTs = if (i == 0) tsd else curTs + tsd
      curOk = pred(code, curTs)
      i += 1
    }

    def exhausted: Boolean = curId == Long.MaxValue

    /** Is `target` an allowed doc? (ascending targets only). */
    def contains(target: Long): Boolean = {
      while (curId < target) advanceRecord()
      curId == target && curOk
    }

    /** Smallest ALLOWED doc ≥ target (Long.MaxValue when exhausted). */
    def ceil(target: Long): Long = {
      while (curId < target || (curId != Long.MaxValue && !curOk)) advanceRecord()
      curId
    }

    private def closeQuietly(): Unit = if (open) { open = false; in.close() }
    def close(): Unit = closeQuietly()
  }
}
