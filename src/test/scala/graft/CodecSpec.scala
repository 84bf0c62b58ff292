package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.functions.Codec

class CodecSpec extends AnyFunSuite with GenCheck {

  test("delta codec round-trips hand cases") {
    for (
      ids <- Seq(
        Array(0L),
        Array(5L),
        Array(0L, 1L, 2L),
        Array(1L, 127L, 128L, 16384L, Long.MaxValue - 1),
        (0L until 1000L).toArray
      )
    ) {
      assert(Codec.decodeDeltas(Codec.encodeDeltas(ids), ids.length).toSeq == ids.toSeq)
    }
  }

  test("compress ∘ decompress = id on arbitrary sorted distinct doc-id lists (incl. >2^32 gaps)") {
    val gen = for {
      gs <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1L << 40))
      start <- Gen.chooseNum(0L, 1L << 50)
    } yield (gs, start)
    forAllSeeded(gen) { case (gs, start) =>
      val ids = gs.scanLeft(start)(_ + _).toArray
      assert(Codec.decodeDeltas(Codec.encodeDeltas(ids), ids.length).toSeq == ids.toSeq)
    }
  }

  test("int codec round-trips") {
    forAllSeeded(Gen.nonEmptyListOf(Gen.chooseNum(0, Int.MaxValue))) { vs =>
      val a = vs.toArray
      assert(Codec.decodeInts(Codec.encodeInts(a), a.length).toSeq == a.toSeq)
    }
  }

  test("delta encoding is compact: dense ids ≈ 1 byte/posting after the first") {
    val ids = (1000000L until 1010000L).toArray
    val bytes = Codec.encodeDeltas(ids)
    assert(bytes.length <= ids.length + 10)
  }

  test("packed (PForDelta-style) codec round-trips") {
    for (
      vals <- Seq(
        Array(0L), Array(0L, 0L, 0L), Array(1L, 127L, 128L, 1L << 40),
        Array.tabulate(128)(i => (i % 7).toLong), // tiny values → few bits
        Array.tabulate(100)(i => if (i == 50) 1L << 50 else 3L) // one outlier → exception patch
      )
    ) {
      assert(Codec.decodePacked(Codec.encodePacked(vals), vals.length).toSeq == vals.toSeq)
    }
    forAllSeeded(Gen.nonEmptyListOf(Gen.chooseNum(0L, 1L << 45))) { vs =>
      val a = vs.toArray
      assert(Codec.decodePacked(Codec.encodePacked(a), a.length).toSeq == a.toSeq)
    }
  }

  test("auto codec round-trips and never exceeds varbyte size") {
    val gen = for {
      gs <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1L << 20))
      start <- Gen.chooseNum(0L, 1L << 40)
    } yield gs.scanLeft(start)(_ + _).toArray
    forAllSeeded(gen) { ids =>
      val auto = Codec.encodeDeltasAuto(ids)
      assert(Codec.decodeDeltasAuto(auto, ids.length).toSeq == ids.toSeq)
      assert(auto.length <= Codec.encodeDeltas(ids).length + 1) // +1 tag byte
    }
    forAllSeeded(Gen.nonEmptyListOf(Gen.chooseNum(0, 1 << 20))) { vs =>
      val a = vs.toArray
      assert(Codec.decodeIntsAuto(Codec.encodeIntsAuto(a), a.length).toSeq == a.toSeq)
    }
  }

  test("base-relative gap codec round-trips; remap = base change only") {
    val gen = for {
      gs <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 1L << 20))
      start <- Gen.chooseNum(0L, 1L << 40)
    } yield gs.scanLeft(start)(_ + _).toArray
    forAllSeeded(gen) { ids =>
      val enc = Codec.encodeGapsFromBase(ids)
      assert(Codec.decodeGapsFromBase(ids.head, enc, ids.length).toSeq == ids.toSeq)
      // the decode-free merge property: shifting every docID by a constant
      // needs ONLY a new base — the payload bytes are reused verbatim
      val off = 1L << 41
      assert(Codec.decodeGapsFromBase(ids.head + off, enc, ids.length).toSeq ==
        ids.map(_ + off).toSeq)
    }
    assert(Codec.decodeGapsFromBase(7L, Codec.encodeGapsFromBase(Array(7L)), 1).toSeq == Seq(7L))
  }

  test("position chunk codec: encode/concat/split/read round-trips") {
    val posGen = Gen.nonEmptyListOf(Gen.chooseNum(1, 1 << 16)).map(_.scanLeft(0)(_ + _).tail.toArray)
    forAllSeeded(Gen.nonEmptyListOf(posGen)) { docs =>
      val chunks = docs.map(d => Codec.encodePosChunk(d))
      val block = chunks.toArray.flatten.toArray
      val tfs = docs.map(_.length).toArray
      // sequential read reproduces every doc's positions
      val r = new Codec.PosReader(block)
      docs.foreach(d => assert(r.readPositions(d.length).toSeq == d.toSeq))
      assert(!r.hasRemaining)
      // splitting recovers the original per-doc chunks byte-for-byte
      val split = Codec.splitPosChunks(block, tfs)
      split.zip(chunks).foreach { case (s, c) => assert(s.toSeq == c.toSeq) }
    }
  }

  test("packed beats varbyte on uniform dense gaps (the common posting shape)") {
    // gaps of a hot term in a dense docID space: mostly 1-4
    val ids = Iterator.iterate(100L)(x => x + 1 + (x % 3)).take(1000).toArray
    val auto = Codec.encodeDeltasAuto(ids)
    val vb = Codec.encodeDeltas(ids)
    assert(auto.head == Codec.TagPacked, "expected packed codec selected")
    assert(auto.length < vb.length, s"packed ${auto.length} !< varbyte ${vb.length}")
  }
}
