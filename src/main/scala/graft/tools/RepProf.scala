package graft.tools

import graft.functions.TextFunctions
import graft.operators.RepetitionStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for the Gopher repetition signals (q151/q152) — times
  * each staged sub-plan cumulatively so the cost of a stage is its delta.
  * The suspicion under test: CollapseProject inlines single-use staged
  * columns (the argmax aggregate, the sorted-adjacency dup values, the flag
  * arrays) INTO the downstream higher-order lambdas, re-evaluating sorts and
  * aggregates per array element — the staging trap SCALE.md documents, in
  * its projection-collapse form.
  *
  * Usage: `runMain graft.tools.RepProf <sfDir>`; min-of-2 after warmup,
  * stderr table.
  */
object RepProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RepProf <sfDir>")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"), col("text"))

    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[repprof] $name%-28s ${ts.drop(1).min}%7.2fs" +
        f"  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val staged = docs
      .withColumn("_toks", TextFunctions.tokens(col("text")))
      .withColumn("_gtop", RepetitionStats.exactGrams(col("_toks"), 2))
      .withColumn("_gdup", RepetitionStats.exactGrams(col("_toks"), 5))

    time("tokens+grams")(staged.select(size(col("_gtop")) + size(col("_gdup"))))
    val (lf, lcf) = RepetitionStats.dupSegmentFractions(split(col("text"), "\n"))
    time("line signals")(docs.select(lf + lcf))
    time("topGramValue")(staged.select(
      length(RepetitionStats.topGramValue(col("_gtop")))))
    time("dupStartFlags")(staged.select(
      size(RepetitionStats.dupStartFlags(col("_gdup")))))
    val withFlags = staged
      .withColumn("_topflags",
        zip_with(col("_gtop"),
          array_repeat(RepetitionStats.topGramValue(col("_gtop")), size(col("_gtop"))),
          (g, v) => coalesce(g === v, lit(false))))
      .withColumn("_dupflags", RepetitionStats.dupStartFlags(col("_gdup")))
    time("flags only")(withFlags.select(size(col("_topflags")) + size(col("_dupflags"))))
    time("top coverage")(withFlags.select(
      RepetitionStats.coveredCharFraction(col("_toks"), col("_topflags"), 2)))
    time("dup coverage")(withFlags.select(
      RepetitionStats.coveredCharFraction(col("_toks"), col("_dupflags"), 5)))
    time("full signals (HOF)")(RepetitionStats.withRepetitionSignalsHof(docs)
      .select(col("dup_gram_char_frac")))
    time("full signals (fused)")(RepetitionStats.withRepetitionSignals(docs)
      .select(col("dup_gram_char_frac")))
    spark.stop()
  }
}
