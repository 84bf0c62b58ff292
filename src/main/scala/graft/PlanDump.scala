package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named gate queries to files:
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...`
  * writes `<outDir>/<query>_<suffix>.txt` — the plan evidence the
  * optimization round commits under plans/r06/.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query>...")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown gate query $name"))
      val df = fn(spark, sfDir)
      val initial = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // run THIS QueryExecution so AQE finalizes (runtime joins,
      // coalescing, stage reuse) — a df.count() would build a fresh
      // QueryExecution and leave this one unexecuted
      df.queryExecution.toRdd.count()
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val plan =
        s"== Initial plan (before execution) ==\n$initial\n\n== Final adaptive plan (after execution) ==\n$finalPlan"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
