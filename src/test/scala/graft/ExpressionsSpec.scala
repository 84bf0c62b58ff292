package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ann
import graft.plans.GraftFunctions

class ExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        ((graft.functions.TextFeatures.mix64(i.toLong * 7 + d) >>> 11).toDouble / (1L << 53) - 0.5).toFloat))
    }

  test("graft_cosine: codegen path matches the Scala kernel exactly") {
    val data = vecs(200, 32)
    val df = spark.createDataFrame(data).toDF("id", "vec")
    val q = data.head._2
    val got = df
      .select($"id", GraftFunctions.cosineSim($"vec", typedlit(q)).as("c"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    data.foreach { case (id, v) =>
      assert(got(id) == Ann.cosine(q, v), s"id $id") // bit-exact, not approx
    }
    // plan stays inside whole-stage codegen (no object-lambda boundary);
    // go through parquet so the plan is a real scan, not LocalTableScan
    val tmp = java.nio.file.Files.createTempDirectory("expr-plan").toString + "/v"
    df.write.parquet(tmp)
    val scanned = spark.read.parquet(tmp)
      .select(GraftFunctions.cosineSim($"vec", typedlit(q)).as("c"))
    val plan = scanned.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks WholeStageCodegen spans in the plan string
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("DeserializeToObject"), plan)
    // and the codegen'd scan agrees with the eval path (self-cosine ≈ 1;
    // sqrt(d)·sqrt(d) ≠ d in the last ulp, so not exactly 1.0)
    val mx = scanned.agg(max($"c")).head().getDouble(0)
    assert(math.abs(mx - 1.0) < 1e-12)
  }

  test("graft_cosine via SQL and the extensions class") {
    val one = spark.sql(
      "SELECT graft_cosine(array(1.0F, 2.0F, 3.0F), array(1.0F, 2.0F, 3.0F)) AS c"
    ).head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c"
    ).head().getDouble(0)
    assert(ortho == 0.0)
    // zero-norm input → 0.0 (never NaN)
    val zero = spark.sql(
      "SELECT graft_cosine(array(0.0F, 0.0F), array(1.0F, 1.0F)) AS c"
    ).head().getDouble(0)
    assert(zero == 0.0)
  }

  test("graft_bm25_impact matches IndexBuilder.impact bit-exactly") {
    val rows = Seq((1.0, 10.0, 25.0), (3.0, 100.0, 25.0), (7.0, 1.0, 25.0))
    val df = rows.toDF("tf", "dl", "avgdl")
      .select($"tf", $"dl", $"avgdl",
        GraftFunctions.bm25Impact($"tf", $"dl", $"avgdl").as("imp"))
    df.collect().foreach { r =>
      val expected = graft.index.IndexBuilder.impact(
        r.getDouble(0).toInt, r.getDouble(1).toInt, r.getDouble(2))
      assert(r.getDouble(3) == expected)
    }
  }

  test("graft_tokenize matches the engine analyzer") {
    val texts = Seq("Hello, World!", "a-b c_d", "Привет 2021 мир", "")
    val got = texts.toDF("t")
      .select(GraftFunctions.tokenize($"t").as("toks"))
      .collect()
      .map(_.getSeq[String](0).toSeq)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == graft.functions.Analyzer.tokenize(t).toSeq, s"text '$t'")
    }
  }

  test("type errors are caught at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(1, 2)").collect()
    }
    assert(e.getMessage.contains("graft_cosine"))
  }
}
