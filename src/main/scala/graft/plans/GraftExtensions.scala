package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native registration of the engine's scalar kernels.
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.plans.GraftExtensions` — the
  *     `SparkSessionExtensions` hook, for spark-submit;
  *   - `GraftFunctions.register(spark)` — runtime registration into an
  *     existing session (tests / driver-owned sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))
    ),
    (
      "graft_bm25_impact",
      info("graft_bm25_impact", "graft_bm25_impact(tf, dl, avgdl) - BM25 term impact, k1=1.2 b=0.75"),
      (es: Seq[Expression]) => Bm25Impact(es(0), es(1), es(2))
    ),
    (
      "graft_tokenize",
      info("graft_tokenize", "graft_tokenize(text) - engine analyzer tokens"),
      (es: Seq[Expression]) => Tokenize(es(0))
    )
  )

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }

  // Column-API wrappers (require register(spark) / the extensions hook)
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
  def bm25Impact(tf: Column, dl: Column, avgDl: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bm25_impact", tf, dl, avgDl)
  def tokenize(text: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_tokenize", text)
}
