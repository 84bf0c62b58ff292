package graft

import org.apache.spark.sql.SparkSession
import graft.functions.Analyzer
import graft.sources.PagesGen

/** Pure-compute scaling probe: tokenize-only job, no shuffle, no I/O.
  * `sbt "runMain graft.CpuProbe <cores> <docs>"`.
  */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val gen = spark.range(0, nDocs, 1, 64).map(i => PagesGen.textFor(i)).cache()
    gen.count()
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val tokens = gen.map(t => Analyzer.termFreqs(t)._1.toLong).reduce(_ + _)
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[cpu] cores=$cores run=$r tokens=$tokens secs=$secs%.2f rate=${nDocs / secs}%.0f docs/s")
    }
    spark.stop()
  }
}
