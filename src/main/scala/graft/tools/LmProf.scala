package graft.tools

import graft.operators.{CurationPipeline, Decontamination, NgramLm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost attribution for the q149 bigram-LM curation gate: times each stage
  * cumulatively (train counts, OOV scoring, the quality/language scan
  * filters, decontamination) so the delta locates the dominant leg.
  *
  * Usage: `runMain graft.tools.LmProf <sfDir>`; min-of-3 after warmup.
  */
object LmProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: LmProf <sfDir>")
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
      System.err.println(f"[lmprof] $name%-24s ${ts.drop(1).min}%7.2fs" +
        f"  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val lm = NgramLm.bigramCounts(docs, "text")
    time("bigramCounts")(lm)
    time("oovBigramRate")(NgramLm.oovBigramRate(docs, "doc_id", "text", lm, 30L))
    time("curate (no lm)")(CurationPipeline.curate(docs))
    val gated = CurationPipeline.curate(docs,
      lmFilter = Some(CurationPipeline.LmFilter(lm, minCount = 30L, maxOovRate = 0.5)))
    time("curate (lm gate)")(gated)
    time("full q149")(Decontamination.decontaminate(
      gated, docs.filter(pmod(col("doc_id"), lit(101)) === 0), "doc_id", "text", n = 3)
      .select(col("doc_id")))
    // decontaminate references its docs side TWICE (gram report + anti-join);
    // staging the gated chain halves the expensive scan
    time("full q149 (staged)")(Decontamination.decontaminate(
      CurationPipeline.curate(docs,
          lmFilter = Some(CurationPipeline.LmFilter(lm, minCount = 30L, maxOovRate = 0.5)))
        .localCheckpoint(),
      docs.filter(pmod(col("doc_id"), lit(101)) === 0), "doc_id", "text", n = 3)
      .select(col("doc_id")))
    System.err.println("[lmprof] lm table rows: " + lm.count())
    spark.stop()
  }
}
