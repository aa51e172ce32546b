package graft.tools

import graft.operators.ProductQuantization
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PQ quality + compression measurement on a scaled embeddings corpus — the
  * [[IvfRecall]] discipline applied to the code path that shrinks per-row
  * scan cost (q120/q121 only pin exactness of encode/ADC against the fixed
  * seed codebook; this records what a real user gets from a TRAINED
  * codebook at corpus scale: recall of quantized ranking, the two-stage
  * refine's recovery, and the on-disk index size vs the raw vectors).
  *
  * Method: train Lloyd codebooks (deterministic seed = lowest-id vectors),
  * encode + pack the corpus, WRITE both the packed index and the raw
  * vectors as parquet (recording real on-disk bytes), then for
  * deterministically-strided query vectors measure against exact
  * squared-L2 brute force:
  *   recall_adc    = |adc_topk ∩ exact_topk| / k
  *   recall_refine = |adc_refine_topk ∩ exact_topk| / k  (refineFactor·k
  *                   candidates re-ranked exactly)
  * Wall times are second-pass (plans warm — each query vector compiles a
  * fresh plan, Janino would dominate at this corpus size otherwise; same
  * protocol as IvfRecall).
  *
  * Usage: PqRecall <embDir> [m=8] [ksub=16] [topK=20] [nQueries=16]
  *                 [iters=4] [refineFactor=5]
  * One JSON line on stdout.
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: PqRecall <embDir> [m] [ksub] [topK] [nQueries] [iters] [refineFactor]")
    val dir = args(0)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(16)
    val topK = args.lift(3).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(16)
    val iters = args.lift(5).map(_.toInt).getOrElse(4)
    val refine = args.lift(6).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pq = ProductQuantization
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val queryIds = (0 until nQueries)
      .map(i => ids(((i.toLong * n) / nQueries).toInt)).distinct
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)

    val t0 = System.nanoTime()
    val cb = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val trainSec = (System.nanoTime() - t0) / 1e9
    val err = pq.quantizationError(emb, "embedding", cb)
    val errSeed = pq.quantizationError(emb, "embedding",
      pq.seedCodebooks(emb, "embedding", "vec_id", m, ksub))

    // the index and raw-scan tables as a user would persist them
    val tmp = java.nio.file.Files.createTempDirectory("pq-recall").toString
    val tIdx0 = System.nanoTime()
    pq.encode(emb, "embedding", cb)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
      .write.mode("overwrite").parquet(s"$tmp/pq_index")
    val buildSec = (System.nanoTime() - tIdx0) / 1e9
    emb.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/raw_vectors")
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
    }
    val idxBytes = dirBytes(s"$tmp/pq_index")
    val rawBytes = dirBytes(s"$tmp/raw_vectors")
    val encoded = spark.read.parquet(s"$tmp/pq_index").localCheckpoint(true)
    val raw = spark.read.parquet(s"$tmp/raw_vectors").localCheckpoint(true)

    def exactTopK(q: Seq[Double]): DataFrame = {
      val v = col("embedding").cast("array<double>")
      val qLit = array(q.map(lit): _*)
      var qq = 0.0; q.foreach(x => qq += x * x)
      raw.select(col("vec_id"),
        (graft.expressions.NativeVec.dot(v, v)
          - lit(2.0) * graft.expressions.NativeVec.dot(v, qLit) + lit(qq)).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(topK)
    }
    def topIds(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet

    val exact = queries.map { case (qid, q) => qid -> topIds(exactTopK(q)) }.toMap
    val tEx0 = System.nanoTime()
    queries.foreach { case (_, q) => exactTopK(q).collect() }
    val exactSec = (System.nanoTime() - tEx0) / 1e9

    val adcRecalls = queries.map { case (qid, q) =>
      topIds(pq.adcTopK(encoded, "packed", "vec_id", cb, q, topK))
        .intersect(exact(qid)).size.toDouble / topK
    }
    val tAdc0 = System.nanoTime()
    queries.foreach { case (_, q) =>
      pq.adcTopK(encoded, "packed", "vec_id", cb, q, topK).collect()
    }
    val adcSec = (System.nanoTime() - tAdc0) / 1e9

    val refRecalls = queries.map { case (qid, q) =>
      topIds(pq.adcTopKRefined(encoded, "packed", "vec_id", raw, "embedding",
        cb, q, topK, refine)).intersect(exact(qid)).size.toDouble / topK
    }
    val tRef0 = System.nanoTime()
    queries.foreach { case (_, q) =>
      pq.adcTopKRefined(encoded, "packed", "vec_id", raw, "embedding",
        cb, q, topK, refine).collect()
    }
    val refSec = (System.nanoTime() - tRef0) / 1e9

    def mean(xs: Iterable[Double]) = xs.sum / xs.size
    println(
      f"""{"metric":"pq_recall","dir":"$dir","n":$n,"m":$m,"ksub":$ksub,"top_k":$topK,"n_queries":${queries.length},"iters":$iters,"refine_factor":$refine,"train_sec":$trainSec%.2f,"index_build_sec":$buildSec%.2f,"quant_err_seed":$errSeed%.6f,"quant_err_trained":$err%.6f,"index_bytes":$idxBytes,"raw_bytes":$rawBytes,"bytes_ratio":${idxBytes.toDouble / rawBytes}%.4f,"exact_sec":$exactSec%.2f,"adc_sec":$adcSec%.2f,"refine_sec":$refSec%.2f,"recall_adc_mean":${mean(adcRecalls)}%.4f,"recall_adc_min":${adcRecalls.min}%.4f,"recall_refine_mean":${mean(refRecalls)}%.4f,"recall_refine_min":${refRecalls.min}%.4f}""")
    spark.stop()
  }
}
