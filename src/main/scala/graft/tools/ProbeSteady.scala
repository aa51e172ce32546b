package graft.tools

import org.apache.spark.sql.SparkSession

/** Steady-state measurement of Bench's two fixed-work probes on THIS machine,
  * in one fresh JVM, printed as raw series — used to pin / audit the idle
  * reference constants in `Bench.idleCalibrationRefSec` / `idleProbeRefSec`.
  * Run: `sbt "runMain graft.tools.ProbeSteady"` on an idle box.
  */
object ProbeSteady {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("count(distinct id % 97)").collect()
    def calib(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 24).selectExpr("count(distinct id % 9973)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 19, 1L, 4).selectExpr("count(distinct id % 9973)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    println("calib: " + (1 to 8).map(_ => f"${calib()}%.3f").mkString(" "))
    println("probe: " + (1 to 10).map(_ => f"${probe()}%.3f").mkString(" "))
    spark.stop()
  }
}
