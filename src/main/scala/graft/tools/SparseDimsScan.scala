package graft.tools

import graft.functions.TextFunctions
import graft.operators.LinearTrainer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dims-scale artifact for the sparse perceptron path (the
  * r13_audio_hash_scan discipline applied to the trainer): fixed corpus,
  * training wall recorded across dims 2^4 → 2^20 for the SPARSE
  * representation, with the dense path alongside while it is still sane
  * (≤ 2^10 — its per-row cost is O(T·dims), which is the whole point).
  * One JSON line per leg; fixture/tokenization cost excluded (tokens
  * checkpointed first — both paths share the same staged token frame). */
object SparseDimsScan {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SparseDimsScan <sfDir> [logDims,...]")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val logDims = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 8, 12, 16, 20))
    val iters = 3
    val denseMaxDims = 1 << 10

    val toks = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("_t"))
      .select(col("doc_id"), col("_t"),
        when(size(col("_t")) >= 55, 1L).otherwise(-1L).as("label"))
      .localCheckpoint(true)
    val nDocs = toks.count()

    def timed(f: => Array[Long]): (Double, Array[Long]) = {
      val t0 = System.nanoTime(); val w = f
      ((System.nanoTime() - t0) / 1e9, w)
    }

    for (ld <- logDims) {
      val dims = 1 << ld
      val sparseFeat = toks
        .withColumn("_sb", LinearTrainer.sortedTokenBuckets(col("_t"), dims))
        .select(col("doc_id"),
          LinearTrainer.sparseCountsFromSorted(col("_sb")).as("sfeat"),
          col("label"))
      val (sparseSec, ws) = timed(
        LinearTrainer.perceptronTrainSparse(sparseFeat, "sfeat", "label", dims, iters))
      val denseSec =
        if (dims > denseMaxDims) -1.0
        else {
          val denseFeat = toks
            .withColumn("_bk", LinearTrainer.tokenBuckets(col("_t"), dims))
            .select(col("doc_id"),
              LinearTrainer.countsFromBuckets(col("_bk"), dims).as("features"),
              col("label"))
          val (sec, wd) = timed(
            LinearTrainer.perceptronTrain(denseFeat, "features", "label", dims, iters))
          require(wd.toSeq == ws.toSeq, s"dense != sparse weights at dims=$dims")
          sec
        }
      println(f"""{"metric":"sparse_dims_scan","dims":$dims,"n_docs":$nDocs,"iters":$iters,"sparse_train_sec":$sparseSec%.2f,"dense_train_sec":$denseSec%.2f,"active_weights":${ws.count(_ != 0L)},"dense_equals_sparse":${denseSec >= 0.0}}""")
    }
    spark.stop()
  }
}
