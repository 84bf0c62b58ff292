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

  def writeVarLong(v: Long, out: ArrayBuffer[Byte]): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0L) {
      out += ((x & 0x7f) | 0x80).toByte
      x >>>= 7
    }
    out += x.toByte
  }

  /** Encode a strictly increasing docID list as first-value + deltas. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ArrayBuffer[Byte](sorted.length * 2)
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
    val out = new ArrayBuffer[Byte](vals.length)
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
}
