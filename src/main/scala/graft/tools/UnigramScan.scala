package graft.tools

import graft.ScaleData
import graft.operators.UnigramLm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer decade scan — the scaling leg for the hard-EM
  * trainer. Phases timed separately because they scale differently by
  * design: the pre-token FREQUENCY pass is the one corpus-wide job (must
  * stay linear in corpus rows), TRAIN's EM iterations touch only the
  * distinct-word table (must stay ~flat as the corpus grows onto a
  * saturating vocabulary — the [[ScaleData]] replica corpus grows distinct
  * pre-tokens by +N suffix tokens, not ×N, exactly the real-corpus shape),
  * and ENCODE is the corpus-wide scan-side Viterbi (linear, throughput is
  * the headline). Encode is forced by summing token counts (no result
  * materialization bias).
  *
  * Usage: UnigramScan <srcDir> <replicas> [label]  (srcDir has
  * documents.parquet; replicas=1 reads it verbatim)
  */
object UnigramScan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: UnigramScan <srcDir> <replicas> [label]")
    val dir = args(0)
    val replicas = args(1).toInt
    val label = args.lift(2).getOrElse(s"${dir.split('/').last}x$replicas")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = (if (replicas <= 1)
        spark.read.parquet(s"$dir/documents.parquet")
      else ScaleData.scaleDocuments(spark, dir, replicas))
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val nWords = graft.operators.BpeTrainer.preTokenFrequencies(docs, "text").count()
    val freqSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val model = UnigramLm.trainUnigram(docs, "text",
      maxPieceLen = 4, vocabSize = 200, iters = 2).localCheckpoint(true)
    val vocabSize = model.count()
    val trainSec = (System.nanoTime() - t1) / 1e9

    // the id-array form, the BpeScan convention: integer token ids per doc,
    // no per-token row explode, no string materialization — the shape a
    // packing pipeline consumes
    val t2 = System.nanoTime()
    val totalTokens = UnigramLm.encodeUnigramToIds(docs, "doc_id", "text", model)
      .select(sum(size(col("token_ids"))).cast("long"))
      .collect()(0).getLong(0)
    val encodeSec = (System.nanoTime() - t2) / 1e9

    println(f"""{"metric":"unigram_scan","label":"$label","dir":"$dir","replicas":$replicas,"n_docs":$nDocs,"distinct_pretokens":$nWords,"vocab_size":$vocabSize,"freq_pass_sec":$freqSec%.2f,"train_sec":$trainSec%.2f,"encode_sec":$encodeSec%.2f,"total_tokens":$totalTokens,"tokens_per_sec":${(totalTokens / math.max(encodeSec, 1e-9)).toLong}}""")
    spark.stop()
  }
}
