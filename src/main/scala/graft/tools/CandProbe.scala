package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver probe for q45-class candidate volume WITHOUT forming the join:
  * the PPJoin prefix join on (block, gram) emits Σ_k c_k·(c_k−1)/2 distinct-
  * capped pairs, so grouping the exploded prefixes and summing c² bounds the
  * candidate set a corpus will generate. One aggregate, no pair
  * materialization — safe at any scale.
  * Usage: CandProbe <dir> [n=1] [threshold=0.8]
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(1)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val gramArr = df
      .select(col("doc_id").as("id"), col("source").as("block"),
        TextFunctions.tokens(col("text")).as("toks"))
      .select(col("id"), col("block"),
        array_sort(array_distinct(transform(
          if (n == 1) col("toks")
          else TextFunctions.wordShinglesOf(col("toks"), n), g => xxhash64(g)))).as("harr"))
      .withColumn("sz", size(col("harr")).cast("long"))
    val pref = gramArr.select(col("id"), col("block"),
      explode(slice(col("harr"), lit(1),
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))).as("gh"))
    val stats = pref.groupBy(col("block"), col("gh")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1) / 2).as("pair_bound"),
        max(col("c")).as("max_key"), count(lit(1)).as("n_keys"),
        sum(col("c")).as("prefix_rows"))
      .collect()(0)
    val docs = gramArr.agg(count(lit(1)), avg(col("sz"))).collect()(0)
    println(s"""{"metric":"cand_probe","dir":"$dir","n":$n,"threshold":$threshold,"docs":${docs.getLong(0)},"mean_sz":${f"${docs.getDouble(1)}%.1f"},"pair_bound":${stats.getAs[java.math.BigDecimal]("pair_bound")},"max_key_docs":${stats.getLong(1)},"n_keys":${stats.getLong(2)},"prefix_rows":${stats.getLong(3)}}""")
    spark.stop()
  }
}
