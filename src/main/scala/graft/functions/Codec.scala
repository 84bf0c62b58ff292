package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Posting-list compression: delta + variable-byte encoding of sorted
  * docID lists, plain varbyte for tf streams. Modeled on the reference's
  * at-rest column codecs (ClickHouse `Int64 Codec(DoubleDelta, LZ4)` /
  * `Delta, LZ4`, `ClickHouseStorage.cs:152-182`) re-expressed as the
  * classic IR posting codec (north rule: "delta + variable-byte/PForDelta
  * compressed"). Pure JVM byte twiddling — runs inside `mapPartitions`,
  * never on the driver.
  *
  * Varbyte format: little-endian base-128, high bit = continuation.
  * Handles the full unsigned-63-bit gap range (gaps can exceed 2^32 at
  * 10^12-doc scale — FIXTURES.md §4).
  */
object Codec extends Serializable {

  /** Growable PRIMITIVE byte buffer for the encode hot paths. The original
    * encoders appended to `ArrayBuffer[Byte]`, which boxes every byte and
    * was a measured build-CPU hot spot (JFR: writeVarLong + Growable.+=
    * several % of the whole build); output bytes are identical.
    */
  final class ByteBuf(initial: Int) {
    private[Codec] var arr = new Array[Byte](math.max(8, initial))
    private[Codec] var len = 0
    @inline def ensure(extra: Int): Unit =
      if (len + extra > arr.length) {
        var cap = arr.length * 2
        while (cap < len + extra) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    @inline def add(b: Byte): Unit = { ensure(1); arr(len) = b; len += 1 }
    def addAll(src: Array[Byte], from: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, from, arr, len, n); len += n
    }
    def size: Int = len
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  def writeVarLong(v: Long, out: ArrayBuffer[Byte]): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0L) {
      out += ((x & 0x7f) | 0x80).toByte
      x >>>= 7
    }
    out += x.toByte
  }

  @inline def writeVarLong(v: Long, out: ByteBuf): Unit = {
    var x = v
    out.ensure(10)
    while ((x & ~0x7fL) != 0L) {
      out.arr(out.len) = ((x & 0x7f) | 0x80).toByte; out.len += 1
      x >>>= 7
    }
    out.arr(out.len) = x.toByte; out.len += 1
  }

  /** Encode a strictly increasing docID list as first-value + deltas. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteBuf(sorted.length * 2)
    var prev = 0L
    var first = true
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (first) { writeVarLong(v, out); first = false }
      else {
        require(v > prev, s"docIDs must be strictly increasing: $prev -> $v")
        writeVarLong(v - prev, out)
      }
      prev = v
      i += 1
    }
    out.toArray
  }

  def decodeDeltas(bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Encode non-negative ints (tf stream) as plain varbyte. */
  def encodeInts(vals: Array[Int]): Array[Byte] = {
    val out = new ByteBuf(vals.length + 8)
    var i = 0
    while (i < vals.length) { writeVarLong(vals(i).toLong, out); i += 1 }
    out.toArray
  }

  def decodeInts(bytes: Array[Byte], count: Int): Array[Int] = {
    val out = new Array[Int](count)
    var pos = 0
    var i = 0
    while (i < count) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }

  // ---- PForDelta-style patched bit-packing ------------------------------
  // Block layout: [bitWidth b: 1B][nExceptions: 1B][varlong values...? no:]
  //   [bit-packed count×b-bit low parts][exceptions: varbyte(pos), varbyte(high)]
  // The bit width is chosen per block to minimise total encoded size;
  // values whose high bits overflow b are "patched" via the exception
  // list (classic PForDelta, Zukowski et al. 2006).

  /** (encoded size, nExceptions) of bit width b; size Int.MaxValue when
    * the exception list would overflow its 1-byte count.
    */
  private def packedSize(vals: Array[Long], b: Int): (Int, Int) = {
    var exBytes = 0
    var nEx = 0
    var i = 0
    while (i < vals.length) {
      val high = if (b >= 64) 0L else vals(i) >>> b
      if (high != 0) {
        nEx += 1
        exBytes += varLen(i.toLong) + varLen(high)
      }
      i += 1
    }
    val sz = if (nEx > 255) Int.MaxValue else 2 + (vals.length * b + 7) / 8 + exBytes
    (sz, nEx)
  }

  @inline private def varLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0L) { n += 1; x >>>= 7 }
    n
  }

  /** Optimal bit width selection, O(n + 64·64) via a bit-length histogram
    * — EXACTLY the same argmin as scanning `packedSize` for every b (the
    * original did 64 full passes per block, a measured encode hot spot):
    * an exception at width b is a value with bitLen > b, its patch costs
    * varLen(pos) + ceil((bitLen−b)/7) bytes, and varLen(pos) depends only
    * on the position's magnitude, which the histogram can't see — so this
    * fast path requires every position to fit in one varbyte (n ≤ 128,
    * true for every posting block at the fixed blockSize 128).
    */
  private def bestWidthSmall(vals: Array[Long]): Int = {
    val cnt = new Array[Int](65)
    var maxBits = 0
    var i = 0
    while (i < vals.length) {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(vals(i))
      cnt(bl) += 1
      if (bl > maxBits) maxBits = bl
      i += 1
    }
    if (maxBits == 0) maxBits = 1 // matches (vals.max | 1L) in the original
    def sizeAt(b: Int): Int = {
      var nEx = 0
      var exBytes = 0
      var l = b + 1
      while (l <= 64) {
        val c = cnt(l)
        if (c > 0) { nEx += c; exBytes += c * (1 + (l - b + 6) / 7) }
        l += 1
      }
      if (nEx > 255) Int.MaxValue else 2 + (vals.length * b + 7) / 8 + exBytes
    }
    var bestB = maxBits
    var bestSize = sizeAt(maxBits)
    var b = 0
    while (b < maxBits) {
      val sz = sizeAt(b)
      if (sz < bestSize) { bestSize = sz; bestB = b }
      b += 1
    }
    bestB
  }

  /** Bit-pack `vals` (non-negative) with per-block optimal width +
    * exception patching.
    */
  def encodePacked(vals: Array[Long]): Array[Byte] = {
    val bestB =
      if (vals.length <= 128 && vals.nonEmpty) bestWidthSmall(vals)
      else {
        val maxBits = if (vals.isEmpty) 0
          else 64 - java.lang.Long.numberOfLeadingZeros(vals.max | 1L)
        var bB = maxBits
        var bestSize = packedSize(vals, maxBits)._1
        var b = 0
        while (b < maxBits) {
          val sz = packedSize(vals, b)._1
          if (sz < bestSize) { bestSize = sz; bB = b }
          b += 1
        }
        bB
      }
    val out = new ByteBuf(2 + (vals.length * bestB + 7) / 8 + 8)
    out.add(bestB.toByte)
    var nEx = 0
    var i = 0
    while (i < vals.length) {
      if (bestB < 64 && (vals(i) >>> bestB) != 0) nEx += 1
      i += 1
    }
    require(nEx <= 255, s"too many exceptions: $nEx")
    out.add(nEx.toByte)
    // bit-pack low parts
    var acc = 0L
    var accBits = 0
    i = 0
    while (i < vals.length) {
      val low = if (bestB >= 64) vals(i) else vals(i) & ((1L << bestB) - 1)
      var remaining = bestB
      var v = low
      while (remaining > 0) {
        val take = math.min(8 - accBits, remaining)
        acc |= (v & ((1 << take) - 1)) << accBits
        v >>>= take
        accBits += take
        remaining -= take
        if (accBits == 8) { out.add(acc.toByte); acc = 0L; accBits = 0 }
      }
      i += 1
    }
    if (accBits > 0) out.add(acc.toByte)
    i = 0
    while (i < vals.length) {
      val high = if (bestB >= 64) 0L else vals(i) >>> bestB
      if (high != 0) { writeVarLong(i.toLong, out); writeVarLong(high, out) }
      i += 1
    }
    out.toArray
  }

  def decodePacked(bytes: Array[Byte], count: Int): Array[Long] = {
    val b = bytes(0) & 0xff
    val nEx = bytes(1) & 0xff
    val out = new Array[Long](count)
    var pos = 2
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < count) {
      var v = 0L
      var got = 0
      while (got < b) {
        if (accBits == 0) { acc = bytes(pos) & 0xffL; accBits = 8; pos += 1 }
        val take = math.min(accBits, b - got)
        v |= (acc & ((1L << take) - 1)) << got
        acc >>>= take
        accBits -= take
        got += take
      }
      out(i) = v
      i += 1
    }
    var e = 0
    while (e < nEx) {
      var shift = 0; var p = 0L; var by = 0
      do { by = bytes(pos) & 0xff; p |= (by & 0x7fL) << shift; shift += 7; pos += 1 } while ((by & 0x80) != 0)
      shift = 0; var h = 0L
      do { by = bytes(pos) & 0xff; h |= (by & 0x7fL) << shift; shift += 7; pos += 1 } while ((by & 0x80) != 0)
      out(p.toInt) |= h << b
      e += 1
    }
    out
  }

  // ---- auto codec: per-block best of varbyte vs packed, 1-byte tag ------
  final val TagVarByte: Byte = 0
  final val TagPacked: Byte = 1

  /** Encode a strictly increasing docID list: first value varbyte'd, gaps
    * via whichever of varbyte / patched-bitpack is smaller (deterministic).
    */
  def encodeDeltasAuto(sorted: Array[Long]): Array[Byte] = {
    val gaps = new Array[Long](sorted.length)
    var i = 0
    var prev = 0L
    while (i < sorted.length) {
      gaps(i) = if (i == 0) sorted(0) else sorted(i) - prev
      prev = sorted(i)
      i += 1
    }
    pickSmaller(gaps)
  }

  def decodeDeltasAuto(bytes: Array[Byte], count: Int): Array[Long] = {
    val gaps = decodeAutoVals(bytes, count)
    var i = 1
    while (i < count) { gaps(i) += gaps(i - 1); i += 1 }
    gaps
  }

  /** Encode non-negative ints (tf/dl streams) with the auto codec. */
  def encodeIntsAuto(vals: Array[Int]): Array[Byte] =
    pickSmaller(vals.map(_.toLong))

  def decodeIntsAuto(bytes: Array[Byte], count: Int): Array[Int] =
    decodeAutoVals(bytes, count).map(_.toInt)

  private def pickSmaller(vals: Array[Long]): Array[Byte] = {
    val vb = {
      val out = new ByteBuf(vals.length * 2)
      var i = 0
      while (i < vals.length) { writeVarLong(vals(i), out); i += 1 }
      out.toArray
    }
    val pk = encodePacked(vals)
    val (tag, body) = if (pk.length < vb.length) (TagPacked, pk) else (TagVarByte, vb)
    val out = new Array[Byte](body.length + 1)
    out(0) = tag
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  // ---- base-relative docID gaps ------------------------------------------
  // The payload stores ONLY the count-1 gaps between consecutive docIDs;
  // the first docID is the block's doc_id_min COLUMN. Remapping a block to
  // a new docID space (segment merge / multi-segment search) is then a
  // pure column update — the payload is never decoded or re-encoded.

  /** Encode ids[1..] as gaps (ids[0] lives in the doc_id_min column). */
  def encodeGapsFromBase(sorted: Array[Long]): Array[Byte] = {
    val gaps = new Array[Long](math.max(0, sorted.length - 1))
    var i = 1
    while (i < sorted.length) {
      require(sorted(i) > sorted(i - 1), s"docIDs must be strictly increasing at $i")
      gaps(i - 1) = sorted(i) - sorted(i - 1)
      i += 1
    }
    pickSmaller(gaps)
  }

  /** Decode a base-relative block back to absolute docIDs. */
  def decodeGapsFromBase(base: Long, bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    if (count == 0) return out
    out(0) = base
    if (count > 1) {
      val gaps = decodeAutoVals(bytes, count - 1)
      var i = 1
      while (i < count) { out(i) = out(i - 1) + gaps(i - 1); i += 1 }
    }
    out
  }

  // ---- position chunks ---------------------------------------------------
  // One posting's token positions, encoded map-side as a self-delimiting
  // plain-varbyte stream: first position raw, then gaps (≥1). Blocks
  // concatenate these chunks as-is (the per-posting tf says how many
  // varints belong to each posting), so the shuffle carries compact bytes
  // and block assembly never re-encodes.

  /** Encode one posting's sorted position list (plain varbyte, no tag). */
  def encodePosChunk(pos: Array[Int]): Array[Byte] = {
    val out = new ByteBuf(pos.length + 2)
    var prev = 0
    var i = 0
    while (i < pos.length) {
      writeVarLong(if (i == 0) pos(0).toLong else (pos(i) - prev).toLong, out)
      prev = pos(i)
      i += 1
    }
    out.toArray
  }

  /** [[encodePosChunk]] straight into a caller buffer (build hot path —
    * no intermediate array per posting). Same bytes.
    */
  def writePosChunk(pos: Array[Int], nPos: Int, out: ByteBuf): Unit = {
    var prev = 0
    var i = 0
    while (i < nPos) {
      writeVarLong(if (i == 0) pos(0).toLong else (pos(i) - prev).toLong, out)
      prev = pos(i)
      i += 1
    }
  }

  /** Sequential varint reader over a concatenated position stream. */
  final class PosReader(bytes: Array[Byte]) {
    private var pos = 0
    def hasRemaining: Boolean = pos < bytes.length
    def byteOffset: Int = pos
    private def readVarInt(): Int = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff; v |= (b & 0x7fL) << shift; shift += 7; pos += 1
      } while ((b & 0x80) != 0)
      v.toInt
    }
    /** Read the next posting's `tf` positions (prefix-summed to absolute). */
    def readPositions(tf: Int): Array[Int] = {
      val out = new Array[Int](tf)
      var prev = 0
      var i = 0
      while (i < tf) { prev += readVarInt(); out(i) = prev; i += 1 }
      out
    }
    /** Skip the next posting's `tf` positions without materializing. */
    def skipPositions(tf: Int): Unit = {
      var i = 0
      while (i < tf) {
        while ((bytes(pos) & 0x80) != 0) pos += 1
        pos += 1
        i += 1
      }
    }
  }

  /** Split a block's concatenated position stream back into per-posting
    * chunks (byte slices — no integer decode), given the tf stream.
    */
  def splitPosChunks(bytes: Array[Byte], tfs: Array[Int]): Array[Array[Byte]] = {
    val r = new PosReader(bytes)
    val out = new Array[Array[Byte]](tfs.length)
    var i = 0
    var start = 0
    while (i < tfs.length) {
      r.skipPositions(tfs(i))
      out(i) = java.util.Arrays.copyOfRange(bytes, start, r.byteOffset)
      start = r.byteOffset
      i += 1
    }
    out
  }

  private def decodeAutoVals(bytes: Array[Byte], count: Int): Array[Long] = {
    val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
    bytes(0) match {
      case TagPacked => decodePacked(body, count)
      case _ =>
        val out = new Array[Long](count)
        var pos = 0
        var i = 0
        while (i < count) {
          var shift = 0; var v = 0L; var b = 0
          do {
            b = body(pos) & 0xff; v |= (b & 0x7fL) << shift; shift += 7; pos += 1
          } while ((b & 0x80) != 0)
          out(i) = v
          i += 1
        }
        out
    }
  }
}
