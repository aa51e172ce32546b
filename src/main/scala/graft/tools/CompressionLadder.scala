package graft.tools

import graft.operators.{ProductQuantization, ScalarQuantization}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The embedding-compression ladder measured on one corpus, one query set,
  * one exact ground truth: raw float32 (1×) / SQ8 (4×, per-dim affine) /
  * PQ 8×256 (32×, trained codebooks) — recall@k and on-disk index bytes
  * per rung, plus SQ8's refine leg. The ladder is the operating decision a
  * pipeline actually makes: SQ8 keeps near-exact recall at 4× compression
  * with no codebook training and no LUT machinery; PQ buys another 8× for
  * a recall price the refine stage must repay (r10_pq_recall measured that
  * side; this artifact adds the middle rung).
  *
  * Usage: CompressionLadder <embDir> [m=8] [ksub=256] [topK=20]
  *                          [nQueries=16] [iters=4] [refine=10]
  */
object CompressionLadder {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: CompressionLadder <embDir> [m] [ksub] [topK] [nQueries] [iters] [refine]")
    val dir = args(0)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(256)
    val topK = args.lift(3).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(16)
    val iters = args.lift(5).map(_.toInt).getOrElse(4)
    val refine = args.lift(6).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pq = ProductQuantization
    val sq = ScalarQuantization
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val dims = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)

    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val queryIds = (0 until nQueries).map(i => ids(((i.toLong * n) / nQueries).toInt)).distinct
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)

    def exactTopK(q: Seq[Double]): Set[Long] = {
      val v = col("embedding").cast("array<double>")
      val qLit = array(q.map(lit): _*)
      var qq = 0.0; q.foreach(x => qq += x * x)
      emb.select(col("vec_id"),
          (graft.expressions.NativeVec.dot(v, v)
            - lit(2.0) * graft.expressions.NativeVec.dot(v, qLit) + lit(qq)).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(topK)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val exact = queries.map { case (qid, q) => qid -> exactTopK(q) }.toMap

    val tmp = java.nio.file.Files.createTempDirectory("ladder").toString
    def treeBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(treeBytes).sum).getOrElse(0L)
    def diskOf(df: org.apache.spark.sql.DataFrame, name: String): Long = {
      df.write.mode("overwrite").parquet(s"$tmp/$name")
      treeBytes(new java.io.File(s"$tmp/$name"))
    }
    val rawDisk = diskOf(emb.select(col("vec_id"), col("embedding")), "raw")

    // SQ8 rung
    val (mins, maxs) = sq.sqTrain(emb, "embedding")
    val sqDisk = diskOf(emb.select(col("vec_id"),
      sq.sqPack(sq.sqEncode(col("embedding"), mins, maxs), dims).as("packed")), "sq8")
    val sqEnc = spark.read.parquet(s"$tmp/sq8")
    def meanRecall(f: Seq[Double] => Set[Long]): Double = {
      val rs = queries.map { case (qid, q) => f(q).intersect(exact(qid)).size.toDouble / topK }
      rs.sum / rs.size
    }
    val rSq = meanRecall(q => sq.sqTopK(sqEnc, "packed", "vec_id", q, mins, maxs, topK)
      .select("vec_id").as[Long].collect().toSet)

    // PQ rung (trained codebooks, full-scan ADC + refine)
    val cb = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val pqDisk = diskOf(pq.encode(emb, "embedding", cb)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed")), "pq")
    val pqEnc = spark.read.parquet(s"$tmp/pq")
    val rPq = meanRecall(q => pq.adcTopK(pqEnc, "packed", "vec_id", cb, q, topK)
      .select("vec_id").as[Long].collect().toSet)
    val rPqRef = meanRecall(q => pq.adcTopKRefined(pqEnc, "packed", "vec_id",
        emb, "embedding", cb, q, topK, refine)
      .select("vec_id").as[Long].collect().toSet)

    println(
      f"""{"metric":"compression_ladder","dir":"$dir","rows":$n,"dims":$dims,"top_k":$topK,"n_queries":${queries.length},"raw":{"disk_bytes":$rawDisk,"recall":1.0},"sq8":{"disk_bytes":$sqDisk,"bytes_vs_raw":${sqDisk.toDouble / rawDisk}%.4f,"recall":$rSq%.4f},"pq_m${m}_k$ksub":{"disk_bytes":$pqDisk,"bytes_vs_raw":${pqDisk.toDouble / rawDisk}%.4f,"recall_adc":$rPq%.4f,"recall_refine$refine":$rPqRef%.4f}}""")
    spark.stop()
  }
}
