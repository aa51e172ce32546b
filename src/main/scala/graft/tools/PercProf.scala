package graft.tools

import graft.functions.TextFunctions
import graft.operators.LinearTrainer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for the q157 perceptron-training chain. */
object PercProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: PercProf <sfDir>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dims = 16
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"), col("text"))

    def time[A](name: String)(f: => A): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[percprof] $name%-24s ${ts.drop(1).min}%7.2fs" +
        f"  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def staged: DataFrame = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("_t"))
      .withColumn("_bk", LinearTrainer.tokenBuckets(col("_t"), dims))
      .select(col("doc_id"),
        LinearTrainer.countsFromBuckets(col("_bk"), dims).as("features"),
        when(size(col("_t")) >= 55, 1L).otherwise(-1L).as("label"))

    time("tokens+buckets")(docs
      .select(size(LinearTrainer.tokenBuckets(TextFunctions.tokens(col("text")), dims)))
      .queryExecution.toRdd.count())
    time("features")(staged.select(size(col("features")))
      .queryExecution.toRdd.count())
    val w = Array.fill(dims)(1L)
    time("margin filter")(staged
      .filter(LinearTrainer.dotWithWeights(col("features"), w.toSeq) * col("label") <= 0)
      .queryExecution.toRdd.count())
    time("one grad agg")(staged
      .filter(LinearTrainer.dotWithWeights(col("features"), w.toSeq) * col("label") <= 0)
      .select(col("label").as("_y"), posexplode(col("features")).as(Seq("_pos", "_x")))
      .groupBy(col("_pos")).agg(sum(col("_x") * col("_y")).as("_g"))
      .collect())
    time("3-iter train")(LinearTrainer.perceptronTrain(staged, "features", "label", dims, 3))
    spark.stop()
  }
}
