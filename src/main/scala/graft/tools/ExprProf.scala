package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for the gram-index scan pipeline — the dominant stage of
  * the whole dedup family at corpus scale (the round-7 sparse-corpus profile
  * measured ~2,200 task-CPU-seconds materializing 5M docs' gram arrays, more
  * than the verify joins it feeds). Runs the pipeline's prefix compositions
  * cumulatively (tokenize → hash → distinct → sort) over a corpus so the cost
  * of each added step is its delta — the measurement that decides whether a
  * native sorted-distinct expression is worth building.
  *
  * Usage: `runMain graft.tools.ExprProf <docsDir>`; min-of-2 after warmup per
  * step, stderr table.
  */
object ExprProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ExprProf <docsDir>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[exprprof] $name%-32s ${ts.drop(1).min}%6.2fs" +
        f"  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val toks = split(trim(lower(col("text"))), "\\s+")
    val hashed = transform(toks, t => xxhash64(t))
    time("scan+tokens")(docs.select(size(toks).as("n")))
    time("+xxhash64 transform")(docs.select(size(hashed).as("n")))
    time("+array_distinct")(docs.select(size(array_distinct(hashed)).as("n")))
    time("+array_sort (full gram stage)")(
      docs.select(size(array_sort(array_distinct(hashed))).as("n")))
    spark.stop()
  }
}
