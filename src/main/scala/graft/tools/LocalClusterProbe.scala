package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke probe for `local-cluster[n,cores,mem]` viability in this sandbox:
  * multi-process executors are the one topology where the segmented verify's
  * executor-side disk story differs from `local[*]` (driver==executor). Run
  * with SPARK_HOME=/opt/spark; prints the executor set and a shuffle result.
  * Kept as a tool: the real leg is [[LocalClusterVerify]]. */
object LocalClusterProbe {
  /** The JDK17 add-opens Spark 4 executors need when launched outside
    * spark-submit — same list as build.sbt's driver javaOptions. */
  val AddOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,4,1024]"))
      .config("spark.executor.extraJavaOptions", AddOpens)
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = spark.range(0, 100000, 1, 8)
      .selectExpr("count(distinct id % 9973)").collect()(0).getLong(0)
    // a graft native expression forces executor-side classloading of repo code
    val g = spark.range(0, 1000, 1, 4)
      .selectExpr("cast(id as string) as s")
      .select(graft.functions.TextFunctions.tokens(org.apache.spark.sql.functions.col("s")))
      .count()
    println(s"[lcprobe] distinct=$n graftRows=$g " +
      s"executors=${spark.sparkContext.getExecutorMemoryStatus.keys.mkString(",")}")
    spark.stop()
  }
}
