package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic dense ID assignment at scale (≙ the reference's global
  * monotonic Id, `EventLogReader.cs:105-106`, SURVEY.md §2.2 P14).
  *
  * NOT `monotonically_increasing_id` (not dense, layout-dependent) and
  * NOT a single global `row_number()` window (one-partition bottleneck —
  * would not survive 10^12 rows). Instead the classic two-pass scheme:
  *
  *   1. range-repartition + sort within partitions by the order key
  *      (one shuffle, fully parallel);
  *   2. count rows per partition (cheap job over the same shuffled data);
  *   3. broadcast the per-partition offsets and add `offset + local_rank`.
  *
  * IDs depend only on the order key (url), never on partition layout, so
  * the same corpus yields the same IDs at local[8] and local[32] —
  * required for the rank-identity + scaling-efficiency protocol
  * (BASELINE.md): throughput runs at different parallelism must not
  * change docIDs.
  */
object DenseId {

  /** Add dense 0-based `idCol` ordered by `orderCol` (must be unique). */
  def assign(df: DataFrame, orderCol: String, idCol: String, numPartitions: Int): DataFrame =
    assignWithCount(df, orderCol, idCol, numPartitions)._1

  /** Like [[assign]], also returning the total row count (already known
    * from the offsets pass — saves callers a count job).
    */
  def assignWithCount(
      df: DataFrame, orderCol: String, idCol: String, numPartitions: Int
  ): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = df.schema.size
    val sortedRdd = df
      .repartitionByRange(numPartitions, col(orderCol))
      .sortWithinPartitions(orderCol)
      .rdd // materialize ONE lineage so the count job's shuffle files are
           // reused by the zip job (Spark skips the map stage on re-run)
    // pass 1: per-partition counts
    val counts = sortedRdd
      .mapPartitionsWithIndex { case (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: zip local rank + broadcast offset. Rows rebuilt via one
    // preallocated array (the old `row.toSeq :+ id` built two Seqs per
    // row — measurable at 10^6-rows-per-second rates)
    val schema = df.schema.add(idCol, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      val base = bOffsets.value(pid)
      var i = 0L
      it.map { row =>
        val arr = new Array[Any](n + 1)
        var j = 0
        while (j < n) { arr(j) = row.get(j); j += 1 }
        arr(n) = base + i
        i += 1
        org.apache.spark.sql.Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    }
    (spark.createDataFrame(rdd, schema), offsets.last)
  }

  /** TYPED fast path for the build pipeline's page staging: same two-pass
    * scheme over a tuple Dataset — the data stays JVM tuples end to end
    * (no generic `Row` rebuild and, crucially, no `createDataFrame`
    * converter pass over every field of every row; `createDataset` plans
    * an ExternalRDD + codegen'd SerializeFromObject instead). Returns
    * (doc_id, url, warc_ts, lang, text) with the count.
    */
  def assignPages(
      ds: org.apache.spark.sql.Dataset[(String, java.sql.Timestamp, String, String)],
      numPartitions: Int
  ): (org.apache.spark.sql.Dataset[(Long, String, java.sql.Timestamp, String, String)], Long) = {
    val spark = ds.sparkSession
    import spark.implicits._
    val sortedRdd = ds
      .repartitionByRange(numPartitions, col("_1"))
      .sortWithinPartitions("_1")
      .rdd // one lineage: the zip job reuses the count job's shuffle files
    val counts = sortedRdd
      .mapPartitionsWithIndex { case (pid, it) => Iterator((pid, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val rdd = sortedRdd.mapPartitionsWithIndex { case (pid, it) =>
      val base = bOffsets.value(pid)
      var i = 0L
      it.map { case (url, ts, lang, text) =>
        val r = (base + i, url, ts, lang, text)
        i += 1
        r
      }
    }
    (spark.createDataset(rdd), offsets.last)
  }

  /** Small-data variant (≤ a few million rows, e.g. test fixtures and the
    * driver's DuckDB-oracle tables): a plain global window — simple,
    * SQL-oracle-friendly, but single-partition; use [[assign]] at scale.
    */
  def assignSmall(df: DataFrame, orderCol: Column, idCol: String): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(orderCol)).cast("long") - 1)
}
