package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFeatures

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *     Queries are BROADCAST (they're small); the corpus is never
  *     shuffled; per-partition partial top-k then a tiny global merge —
  *     the same pattern that scales to 10^12 vectors on a cluster.
  *   - [[ivfTopK]] — IVF-style: k-means-lite centroids (deterministic
  *     seeded corpus sample), vectors assigned to nearest centroid
  *     (inverted lists), queries probe the `nProbe` nearest lists. The
  *     scan touches nProbe/nLists of the corpus.
  */
object Ann {

  @inline def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  @inline def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Random-hyperplane sign sketch (deterministic planes from seed). */
  def hyperplaneSketch(v: Array[Float], planes: Int, seed: Long = 42L): Long = {
    var sketch = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < v.length) {
        // deterministic pseudo-gaussian-ish plane component in [-1, 1)
        val h = TextFeatures.mix64(seed ^ (p.toLong << 32) ^ i.toLong)
        s += v(i).toDouble * ((h >> 11).toDouble / (1L << 52).toDouble - 1.0)
        i += 1
      }
      if (s >= 0) sketch |= (1L << p)
      p += 1
    }
    sketch
  }

  /** Exact cosine top-k per query. `queries`: (qid, vec); `corpus`:
    * (id, vec). Result: (qid, id, cosine, rank), rank 1..k, ties broken
    * by ascending id.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qidCol: String,
      qvecCol: String,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .select(col(qidCol).cast("long"), col(qvecCol))
      .as[(Long, Array[Float])]
      .collect() // queries are few by construction; corpus stays distributed
    val bq = spark.sparkContext.broadcast(qs.map { case (qid, v) => (qid, v, norm(v)) })

    val partial = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val queries = bq.value
        // one bounded heap per query per partition
        val heaps = queries.map(_ => new BoundedTopK(k))
        it.foreach { case (id, v) =>
          val nv = norm(v)
          var qi = 0
          while (qi < queries.length) {
            val (_, qv, nq) = queries(qi)
            val c = if (nv == 0.0 || nq == 0.0) 0.0 else dot(qv, v) / (nq * nv)
            heaps(qi).offer(id, c)
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.result.map { case (id, c) => (queries(qi)._1, id, c) }
        }
      }
      .toDF("qid", "id", "cosine")

    // global merge: nPartitions × nQueries × k rows — tiny
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"id".asc)
    partial
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"qid", $"id", $"cosine", $"rank".cast("long").as("rank"))
  }

  /** (score desc, id asc) bounded top-k accumulator. */
  private[operators] final class BoundedTopK(k: Int) {
    private val ord =
      Ordering.by[(Long, Double), (Double, Long)] { case (id, s) => (-s, id) }
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)
    def offer(id: Long, s: Double): Unit = {
      if (heap.size < k) heap.enqueue((id, s))
      else {
        val (wid, ws) = heap.head
        if (s > ws || (s == ws && id < wid)) { heap.dequeue(); heap.enqueue((id, s)) }
      }
    }
    def result: Array[(Long, Double)] = heap.toArray.sortBy { case (id, s) => (-s, id) }
  }

  /** IVF-bucketed ANN: centroids from a deterministic corpus sample, one
    * Lloyd refinement pass, vectors assigned to nearest centroid, query
    * probes the nProbe nearest lists. Approximate — recall measured in
    * tests against [[bruteForceTopK]].
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qidCol: String,
      qvecCol: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]

    // centroid seed: first nLists vectors by id (deterministic), then one
    // distributed Lloyd pass to spread them
    val seedCentroids = vecs.orderBy(col(idCol)).limit(nLists).collect().map(_._2)
    val bSeed = spark.sparkContext.broadcast(seedCentroids)
    val refined: Array[Array[Float]] = vecs
      .mapPartitions { it =>
        val cs = bSeed.value
        val sums = Array.fill(cs.length)(new Array[Double](cs.headOption.map(_.length).getOrElse(0)))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val c = nearest(cs, v)
          counts(c) += 1
          var i = 0
          while (i < v.length) { sums(c)(i) += v(i); i += 1 }
        }
        Iterator.tabulate(cs.length)(c => (c, sums(c), counts(c)))
      }
      .groupByKey(_._1)
      .mapGroups { (c, it) =>
        val all = it.toArray
        val dim = all.head._2.length
        val sum = new Array[Double](dim)
        var cnt = 0L
        all.foreach { case (_, s, n) =>
          cnt += n
          var i = 0
          while (i < dim) { sum(i) += s(i); i += 1 }
        }
        val out = new Array[Float](dim)
        if (cnt > 0) { var i = 0; while (i < dim) { out(i) = (sum(i) / cnt).toFloat; i += 1 } }
        (c, out)
      }
      .collect()
      .sortBy(_._1)
      .map { case (c, v) => if (v.forall(_ == 0f)) bSeed.value(c) else v }

    val bCent = spark.sparkContext.broadcast(refined)

    val assigned = vecs
      .map { case (id, v) => (nearest(bCent.value, v), id, v) }
      .toDF("list", "id", "vec")

    val qs = queries
      .select(col(qidCol).cast("long"), col(qvecCol))
      .as[(Long, Array[Float])]
      .collect()
    val probes: Array[(Long, Array[Float], Array[Int])] = qs.map { case (qid, qv) =>
      (qid, qv, nearestN(refined, qv, nProbe))
    }
    val bProbes = spark.sparkContext.broadcast(probes)

    import org.apache.spark.sql.Encoders
    val partial = assigned
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        val ps = bProbes.value
        val heaps = ps.map(_ => new BoundedTopK(k))
        it.foreach { case (list, id, v) =>
          var qi = 0
          while (qi < ps.length) {
            val (_, qv, lists) = ps(qi)
            if (lists.contains(list)) heaps(qi).offer(id, cosine(qv, v))
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.result.map { case (id, c) => (ps(qi)._1, id, c) }
        }
      }
      .toDF("qid", "id", "cosine")

    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"id".asc)
    partial
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"qid", $"id", $"cosine", $"rank".cast("long").as("rank"))
  }

  private def nearest(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val d = sqDist(cs(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def nearestN(cs: Array[Array[Float]], v: Array[Float], n: Int): Array[Int] =
    cs.indices.sortBy(c => sqDist(cs(c), v)).take(n).toArray

  @inline private def sqDist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }
}
