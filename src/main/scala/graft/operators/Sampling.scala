package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and train/val/test splitting for
  * training-data pipelines.
  *
  * The selection rule is a PURE function of (id, salt): bucket =
  * first-8-hex-chars(md5(id ∥ salt)) mod `Buckets`. That buys the three
  * properties random() cannot give at 100 TB:
  *   - reproducible: re-running the pipeline (or a failed task retry)
  *     selects the SAME rows — no resampling drift between runs;
  *   - stable under growth: a doc's split assignment never changes when
  *     other docs are added or the data is repartitioned (the classic
  *     train/test-contamination guard — a doc can't migrate from test
  *     to train between dataset versions);
  *   - coordination-free: a pure per-row map (codegen'd md5/conv —
  *     no UDF), no shuffle, no driver state, trivially pushes through
  *     column pruning.
  *
  * md5 (not xxhash/murmur) because every engine agrees on its bytes —
  * the DuckDB oracle recomputes the assignment bit-for-bit, and a
  * downstream consumer in any language can re-derive membership.
  * The salt decorrelates independent samples (two 10% samples with
  * different salts overlap ~1%, same salt ⇒ nested).
  */
object Sampling {

  /** Bucket granularity: rates resolve to 1/10000ths (0.01% steps). */
  val Buckets = 10000

  /** The assignment column: uniform in [0, Buckets) per (id, salt). */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Deterministic `rate` sample: keep rows whose bucket < rate·Buckets.
    * Same (salt, rate) ⇒ same rows forever; larger rate ⇒ superset
    * (nested samples — grow a subsample without reshuffling history).
    */
  def sample(df: DataFrame, idCol: String, rate: Double, salt: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, "rate in [0,1]")
    df.where(hashBucket(col(idCol), salt) < math.round(rate * Buckets))
  }

  /** Disjoint named splits ("train" → 0.9, "val" → 0.05, "test" → 0.05):
    * adds a `split` column by cumulative bucket ranges in the GIVEN
    * order; fractions may sum to < 1 (the remainder gets null and is
    * dropped). Order is part of the contract — appending a new split
    * later leaves existing assignments untouched.
    */
  def split(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: String
  ): DataFrame = {
    require(fractions.nonEmpty, "no splits")
    require(fractions.map(_._1).distinct.size == fractions.size, "duplicate split names")
    require(fractions.forall(_._2 > 0.0), "fractions must be positive")
    require(fractions.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val edges = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets)
    }
    val b = hashBucket(col(idCol), salt)
    val assign = fractions.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), i)) =>
        when(b >= edges(i) && b < edges(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign).where(col("split").isNotNull)
  }

  /** Stratified deterministic sample: per-stratum rates (e.g. keep 100%
    * of rare languages, 5% of English) with a default for unlisted
    * strata. Still a pure per-row map — the rate lookup is a codegen'd
    * CASE over the (small, declared) strata map, NOT a join.
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String
  ): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates in [0,1]")
    val thresh = rates.foldLeft(lit(math.round(defaultRate * Buckets))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.where(hashBucket(col(idCol), salt) < thresh)
  }
}
