package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup: exercise the scan->shuffle->agg machinery once so the
    // first timed query doesn't absorb classloading + first-codegen cost.
    spark.range(1 << 20).selectExpr("count(distinct id % 97)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Count the EXECUTED plan's rows, not df.count(): a count() on top lets
      // the optimizer prune every computed column, so pure-projection queries
      // (fingerprints, scores) would be timed as bare scans. The root-level
      // orderBy (determinism-only, the comparator re-sorts) is stripped —
      // top-k sorts sit under Limit and are kept.
      val n = try {
        org.apache.spark.sql.graftbridge.ColumnBridge
          .dropRootSort(fn(spark, sfDir)).queryExecution.toRdd.count()
      } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2fs  rows=$n")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
