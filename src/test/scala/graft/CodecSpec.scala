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
}
