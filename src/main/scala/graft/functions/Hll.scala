package graft.functions

/** HyperLogLog++ sketch for the ES `cardinality` aggregation — the
  * textbook design (Flajolet et al. 2007; Heule et al. "HyperLogLog in
  * Practice", EDBT 2013): 2^p byte registers holding the max leading-zero
  * rank per bucket, with a SPARSE mode that stays an exact hash set until
  * `sparseLimit` distinct hashes, then promotes to dense registers.
  *
  * Why both modes matter at 10^12 docs: the sketch is the slice partial —
  * what crosses the network is ≤ max(8·sparseLimit, 2^p) bytes per
  * (segment, slice) task, INDEPENDENT of the field's cardinality (the
  * property that makes the agg safe on a high-cardinality keyword where
  * a distinct-merge would shuffle every value). Sparse mode keeps the
  * answer EXACT for the low-cardinality fields that dominate dashboards
  * (lang, source, host): merging sparse sketches unions the hash sets, so
  * as long as the union stays under the limit the reported count has zero
  * error — which is what lets the DuckDB oracle gate it hash-exact.
  *
  * Deterministic: no RNG anywhere; the hash is supplied by the caller.
  */
final class Hll private (
    val p: Int,
    val sparseLimit: Int,
    private var sparse: scala.collection.mutable.HashSet[Long],
    private var registers: Array[Byte]
) extends Serializable {

  def this(p: Int = 14, sparseLimit: Int = 4096) =
    this(p, sparseLimit, scala.collection.mutable.HashSet.empty[Long], null)

  private def m: Int = 1 << p

  def isSparse: Boolean = registers == null

  def add(hash: Long): Unit =
    if (isSparse) {
      sparse.add(hash)
      if (sparse.size > sparseLimit) promote()
    } else addDense(hash)

  private def addDense(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    // rank = leading zeros of the remaining 64-p bits, +1; all-zero rest
    // caps at 64-p+1 (the standard convention)
    val rank = (math.min(java.lang.Long.numberOfLeadingZeros(rest), 64 - p) + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
  }

  private def promote(): Unit = {
    registers = new Array[Byte](m)
    sparse.foreach(addDense)
    sparse = null
  }

  def merge(other: Hll): Unit = {
    require(other.p == p, "HLL precision mismatch")
    if (other.isSparse) {
      // via add(): a mid-merge promotion flips this sketch to dense and
      // the remaining hashes must follow the dense path
      other.sparse.foreach(add)
    } else {
      if (isSparse) promote()
      var i = 0
      while (i < m) {
        if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
        i += 1
      }
    }
  }

  /** (estimate, exact?) — exact (zero-error) while still sparse. Dense
    * estimation is the standard pipeline: raw HLL estimate with the
    * alpha_m bias constant, linear counting below the small-range
    * threshold (the HLL++ empirical crossover).
    */
  def estimate: (Long, Boolean) =
    if (isSparse) (sparse.size.toLong, true)
    else {
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        invSum += 1.0 / (1L << registers(i)).toDouble
        if (registers(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m.toDouble * m.toDouble / invSum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
        else raw
      (math.round(est), false)
    }

  /** Wire form for the slice→driver partial: sparse hashes or dense
    * registers, tagged. Bounded by max(8·sparseLimit, 2^p) + 6 bytes.
    */
  def serialize(): Array[Byte] = {
    val buf =
      if (isSparse) {
        val b = java.nio.ByteBuffer.allocate(6 + 8 * sparse.size)
        b.put(0.toByte).put(p.toByte).putInt(sparse.size)
        sparse.foreach(b.putLong)
        b
      } else {
        val b = java.nio.ByteBuffer.allocate(6 + m)
        b.put(1.toByte).put(p.toByte).putInt(m)
        b.put(registers)
        b
      }
    buf.array()
  }
}

object Hll {
  def deserialize(bytes: Array[Byte], sparseLimit: Int = 4096): Hll = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    val tag = b.get()
    val p = b.get().toInt
    val n = b.getInt()
    if (tag == 0) {
      val s = scala.collection.mutable.HashSet.empty[Long]
      var i = 0
      while (i < n) { s.add(b.getLong()); i += 1 }
      new Hll(p, sparseLimit, s, null)
    } else {
      val regs = new Array[Byte](n)
      b.get(regs)
      new Hll(p, sparseLimit, null, regs)
    }
  }

  /** 64-bit string hash for sketch input: FNV-1a over UTF-8 bytes with a
    * 64-bit finalizer mix (FNV alone has weak low-bit avalanche — HLL
    * reads both the TOP p bits and the low-bit run lengths, so the
    * finalizer matters). Pure public arithmetic, deterministic across
    * JVMs.
    */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    TextFeatures.mix64(h)
  }
}
