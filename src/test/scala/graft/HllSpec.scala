package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Hll, TextFeatures}

/** HyperLogLog++ sketch: sparse-mode exactness (the DuckDB-gate
  * contract), dense-mode error bounds, merge across modes, and the wire
  * form's size bound (the slice-partial exchange contract).
  */
class HllSpec extends AnyFunSuite {

  private def hashes(n: Int, salt: Long = 0L): Seq[Long] =
    (0 until n).map(i => TextFeatures.mix64(i.toLong * 0x9e3779b97f4a7c15L + salt))

  test("sparse mode is exact and survives serialization") {
    val h = new Hll(14, 4096)
    val hs = hashes(1000)
    hs.foreach(h.add)
    hs.take(300).foreach(h.add) // duplicates must not count
    assert(h.estimate == ((1000L, true)))
    val rt = Hll.deserialize(h.serialize())
    assert(rt.estimate == ((1000L, true)))
  }

  test("dense mode estimates within the published error band") {
    // p=14 → stderr ≈ 1.04/√16384 ≈ 0.81%; assert 3σ ≈ 2.5%
    Seq(20000, 100000, 500000).foreach { n =>
      val h = new Hll(14, 4096)
      hashes(n, salt = n).foreach(h.add)
      val (est, exact) = h.estimate
      assert(!exact)
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.025, s"n=$n est=$est err=$err")
    }
  }

  test("merges: sparse+sparse stays exact under the limit, promotes over it; " +
    "sparse+dense and dense+dense agree with one-shot") {
    // sparse ∪ sparse below limit: exact union
    val a = new Hll(14, 4096); hashes(1500, 1).foreach(a.add)
    val b = new Hll(14, 4096); hashes(1500, 1).take(500).foreach(b.add) // subset
    a.merge(b)
    assert(a.estimate == ((1500L, true)))
    // forced promotion: union exceeds the sparse limit → dense, still accurate
    val c = new Hll(14, 256); hashes(200, 2).foreach(c.add)
    val d = new Hll(14, 256); hashes(200, 3).foreach(d.add)
    c.merge(d)
    val (estC, exactC) = c.estimate
    assert(!exactC && math.abs(estC - 400) <= 400 * 0.1, s"promoted est $estC")
    // dense ∪ dense ≡ one sketch over the union (register-wise max is lossless)
    val all = hashes(60000, 4)
    val one = new Hll(12, 16); all.foreach(one.add)
    val e = new Hll(12, 16); all.take(30000).foreach(e.add)
    val f = new Hll(12, 16); all.drop(30000).foreach(f.add)
    e.merge(f)
    assert(e.estimate == one.estimate, "merged dense != one-shot dense")
    // serialization round trip preserves dense estimate
    assert(Hll.deserialize(e.serialize(), 16).estimate == one.estimate)
  }

  test("wire form stays within the exchange bound") {
    val h = new Hll(14, 4096)
    hashes(1000000, 5).foreach(h.add)
    assert(h.serialize().length <= 6 + (1 << 14), "dense partial exceeds 2^p + header")
    val s = new Hll(14, 4096)
    hashes(4096, 6).foreach(s.add)
    assert(s.serialize().length <= 6 + 8 * 4096, "sparse partial exceeds 8·limit + header")
  }

  test("hashString: distinct strings hash distinctly (sanity) and deterministically") {
    val vals = (0 until 5000).map(i => s"src$i")
    assert(vals.map(Hll.hashString).distinct.size == vals.size)
    assert(Hll.hashString("lang=en") == Hll.hashString("lang=en"))
  }
}
