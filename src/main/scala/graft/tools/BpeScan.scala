package graft.tools

import graft.operators.BpeTrainer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE tokenization throughput scan — the decade-scaling leg for the
  * pipeline's hottest operator. Phases timed separately because they scale
  * differently by design: TRAIN touches only the pre-token frequency table
  * (one corpus-wide aggregate, then vocabulary-sized rounds), ENCODE is the
  * corpus-wide scan-side pass ([[graft.expressions.BpeApply]] — the phase
  * that must stay linear and whose Zipf memo cache carries the throughput).
  * Encode is forced by summing token counts (no result materialization
  * bias); distinct pre-token counts anchor the cache-hit story in the
  * artifact.
  *
  * Usage: BpeScan <docsDir> [rounds=12] [label]   (docsDir has
  * documents.parquet)
  */
object BpeScan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BpeScan <docsDir> [rounds] [label]")
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val label = args.lift(2).getOrElse(dir.split('/').last)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").localCheckpoint(true)
    val nDocs = docs.count()
    val nDistinctPretok = BpeTrainer.preTokenFrequencies(docs, "text").count()

    val t0 = System.nanoTime()
    val merges = BpeTrainer.trainMerges(docs, "text", rounds)
    val nMerges = merges.count()
    val voc = BpeTrainer.vocab(docs, "text", merges)
    val vocabSize = voc.count()
    val trainSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val totalTokens = BpeTrainer.encodeToIds(docs, "text", merges, voc)
      .select(sum(size(col("token_ids"))).cast("long"))
      .collect()(0).getLong(0)
    val encodeSec = (System.nanoTime() - t1) / 1e9

    println(f"""{"metric":"bpe_scan","label":"$label","dir":"$dir","n_docs":$nDocs,"distinct_pretokens":$nDistinctPretok,"rounds":$rounds,"n_merges":$nMerges,"vocab_size":$vocabSize,"train_sec":$trainSec%.2f,"encode_sec":$encodeSec%.2f,"total_tokens":$totalTokens,"tokens_per_sec":${(totalTokens / math.max(encodeSec, 1e-9)).toLong}}""")
    spark.stop()
  }
}
