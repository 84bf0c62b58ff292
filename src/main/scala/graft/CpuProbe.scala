package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Analyzer
import graft.sources.PagesGen

/** Pure-compute scaling probe: tokenize-only job, no shuffle, no I/O —
  * the workload-shaped SAME-BOX CONTROL for the scaling-efficiency
  * protocol (BASELINE.md): pinning N vs 4N cores of one machine shares a
  * fixed memory system, so this control's 8→32 efficiency is the ceiling
  * any plan can reach here; the bench reports the pipeline's efficiency
  * both raw and relative to this control, measured in the SAME run.
  * `sbt "runMain graft.CpuProbe <cores> <docs>"`.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val gen = spark.range(0, nDocs, 1, 64).map(i => PagesGen.textFor(i)).cache()
    gen.count()
    val rates = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      val tokens = gen.map(t => Analyzer.termFreqs(t)._1.toLong).reduce(_ + _)
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[cpu] cores=$cores run=$r tokens=$tokens secs=$secs%.2f rate=${nDocs / secs}%.0f docs/s")
      nDocs / secs
    }
    println(f"""CPUPROBE{"cores":$cores,"docs":$nDocs,"rate":${rates.max}%.1f}""")
    spark.stop()
  }
}
