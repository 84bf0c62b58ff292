package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalar int8 quantization for embedding columns — the standard
  * memory/bandwidth lever of large-scale vector pipelines (4× smaller
  * than float32; FAISS's SQ8, Lucene/ES `int8_hnsw` quantization): train
  * per-dimension (lo, hi) in ONE distributed pass, encode each float to
  * `round((v−lo)·255/(hi−lo))` stored as one byte, reconstruct as
  * `lo + code·(hi−lo)/255`.
  *
  * All arithmetic is DOUBLE over float32 inputs with a fixed op order —
  * deterministic and SQL-mirrorable, so the round-trip is DuckDB-gated
  * exactly (q_quantize_roundtrip), not just eyeballed.
  *
  * Scale shape: [[fit]] is one `treeReduce` of dim-sized arrays (bytes
  * per partition, never row-count-sized); [[encode]] is a pure map;
  * [[bruteForceTopKQuantized]] searches the DECODED (approximate) space
  * with the standard bucketless brute-force kernel and then re-ranks the
  * widened candidate set against the exact float vectors — the
  * candidate join carries bare ids (the same discipline as the dedup
  * pipelines), so full vectors move only for candidates.
  */
object Quantize {

  final case class Params(lo: Array[Float], hi: Array[Float]) extends Serializable {
    require(lo.length == hi.length)
    def dims: Int = lo.length
  }

  /** Per-dimension (min, max) over the corpus: one treeReduce pass. */
  def fit(embs: DataFrame, vecCol: String): Params = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (lo, hi) = embs.select(col(vecCol)).as[Array[Float]]
      .rdd
      .map(v => (v, v))
      .treeReduce { case ((lo1, hi1), (lo2, hi2)) =>
        val lo = new Array[Float](lo1.length)
        val hi = new Array[Float](hi1.length)
        var i = 0
        while (i < lo.length) {
          lo(i) = math.min(lo1(i), lo2(i))
          hi(i) = math.max(hi1(i), hi2(i))
          i += 1
        }
        (lo, hi)
      }
    Params(lo, hi)
  }

  /** Saturating encode (FAISS/ES SQ8 semantics): components outside the
    * fitted (lo, hi) — the normal case when quantizing new or streaming
    * data with trained params — clamp to 0/255 instead of wrapping to a
    * wildly wrong byte under the `& 0xff` store. In-range arithmetic is
    * unchanged (oracle-mirrored op order).
    */
  @inline private def codeOf(v: Float, lo: Float, hi: Float): Int =
    if (hi == lo) 0
    else {
      // clamp in LONG space BEFORE narrowing: a far-out component's code
      // can exceed Int range, and toInt-then-clamp would wrap first
      val c = math.round((v.toDouble - lo.toDouble) * 255.0 / (hi.toDouble - lo.toDouble))
      math.max(0L, math.min(255L, c)).toInt
    }

  @inline private def reconOf(code: Int, lo: Float, hi: Float): Double =
    if (hi == lo) lo.toDouble
    else lo.toDouble + code.toDouble * (hi.toDouble - lo.toDouble) / 255.0

  /** Encode ONE vector (the executor-side kernel [[encode]] maps over;
    * public so composed indexes — quantized IVF lists — encode rows
    * in their own map without a second frame pass).
    */
  def encodeVec(v: Array[Float], p: Params): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = (codeOf(v(i), p.lo(i), p.hi(i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** (id, codes) — one byte per dimension (unsigned, stored biased as a
    * signed JVM byte).
    */
  def encode(embs: DataFrame, idCol: String, vecCol: String, p: Params): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val bP = spark.sparkContext.broadcast(p)
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, encodeVec(v, bP.value)) }
      .toDF(idCol, "codes")
  }

  /** Reconstructed (approximate) float vector of one code row. */
  def decodeVec(codes: Array[Byte], p: Params): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) {
      out(i) = reconOf(codes(i) & 0xff, p.lo(i), p.hi(i)).toFloat
      i += 1
    }
    out
  }

  /** Per-row max abs reconstruction error ×1e4 (the DuckDB-gated
    * round-trip contract: same doubles, same op order as the oracle SQL).
    */
  def roundTripError(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val p = fit(embs, vecCol)
    val bP = spark.sparkContext.broadcast(p)
    embs.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val pp = bP.value
        var maxErr = 0.0
        var i = 0
        while (i < v.length) {
          val r = reconOf(codeOf(v(i), pp.lo(i), pp.hi(i)), pp.lo(i), pp.hi(i))
          val e = math.abs(r - v(i).toDouble)
          if (e > maxErr) maxErr = e
          i += 1
        }
        (id, math.round(maxErr * 10000.0))
      }
      .toDF(idCol, "err_e4")
  }

  /** Cosine top-k over the QUANTIZED space with exact re-ranking: search
    * the decoded approximation for k·`rerankFactor` candidates per query
    * (4× less memory touched than float32 brute force at the same plan),
    * then join the candidates' EXACT vectors back and keep the true
    * top-k by exact cosine. With a sufficient widening factor the result
    * equals exact brute force (tested as a recall property).
    */
  def bruteForceTopKQuantized(
      queries: DataFrame,
      quantized: DataFrame, // (id, codes) from encode()
      p: Params,
      fullVecs: DataFrame, // (id, vec) exact float vectors (rerank side)
      qidCol: String,
      qvecCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      rerankFactor: Int = 4
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bP = spark.sparkContext.broadcast(p)
    val decoded = quantized.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Byte])]
      .map { case (id, codes) => (id, decodeVec(codes, bP.value)) }
      .toDF(idCol, vecCol)
    val cand = Ann.bruteForceTopK(
      queries, decoded, qidCol, qvecCol, idCol, vecCol, k * rerankFactor)
      .select(col("qid").as(qidCol), col("id").as(idCol)) // bare ids into the rerank join
    val exact = cand
      .join(fullVecs.select(col(idCol).cast("long"), col(vecCol).as("cvec")), idCol)
      .join(queries.select(col(qidCol).cast("long"), col(qvecCol).as("qv")), qidCol)
      .select(col(qidCol), col(idCol), col("qv"), col("cvec"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (qid, id, qv, cv) =>
        (qid, id, Ann.dot(qv, cv) / (Ann.norm(qv) * Ann.norm(cv)))
      }
      .toDF(qidCol, idCol, "cosine")
    val w = Window.partitionBy(col(qidCol)).orderBy(desc("cosine"), asc(idCol))
    exact.withColumn("rank", row_number().over(w).cast("long")).where(col("rank") <= k)
  }
}
