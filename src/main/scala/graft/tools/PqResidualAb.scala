package graft.tools

import graft.operators.{ProductQuantization, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Residual-vs-plain PQ A/B at identical code bytes — the measurement the
  * residual encoder exists for: does quantizing `v − coarse(cell)` instead
  * of `v` buy recall at the same m×ksub geometry? Both arms share the SAME
  * trained coarse quantizer, corpus, queries, and exact-L2 ground truth;
  * only the codebook space differs. Arms:
  *   plain_adc      — [[ProductQuantization.adcTopK]] full scan
  *   resid_adc      — [[ProductQuantization.ivfPqResidualTopK]] nprobe=kCent
  *                    (full probe: same rows scanned as plain — the encoding
  *                    is the only variable)
  *   {plain,resid}_refine — two-stage with the same refine factor
  * Quantization errors for both arms anchor the mechanism: residual error
  * lower ⟹ recall should follow.
  *
  * Usage: PqResidualAb <embDir> [kCent=16] [m=8] [ksub=256] [topK=20]
  *                     [nQueries=16] [iters=4] [refine=10]
  */
object PqResidualAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: PqResidualAb <embDir> [kCent] [m] [ksub] [topK] [nQueries] [iters] [refine]")
    val dir = args(0)
    val kCent = args.lift(1).map(_.toInt).getOrElse(16)
    val m = args.lift(2).map(_.toInt).getOrElse(8)
    val ksub = args.lift(3).map(_.toInt).getOrElse(256)
    val topK = args.lift(4).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(5).map(_.toInt).getOrElse(16)
    val iters = args.lift(6).map(_.toInt).getOrElse(4)
    val refine = args.lift(7).map(_.toInt).getOrElse(10)
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

    val coarse = SimilaritySearch.kmeansCentroids(emb, "embedding", "vec_id", kCent, iters)
    val assigned = SimilaritySearch.assignCells(emb, "embedding", coarse)
      .localCheckpoint(true)
    val cbPlain = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val cbResid = pq.trainCodebooksResidual(assigned, "embedding", "vec_id",
      "ivf_cell", coarse, m, ksub, iters)
    val errPlain = pq.quantizationError(emb, "embedding", cbPlain)
    val errResid = pq.quantizationErrorResidual(assigned, "embedding", "ivf_cell",
      coarse, cbResid)

    val encPlain = pq.encode(emb, "embedding", cbPlain)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
      .localCheckpoint(true)
    val encResid = pq.encodeResidual(assigned, "embedding", "ivf_cell", coarse, cbResid)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
        col("ivf_cell"))
      .localCheckpoint(true)
    val raw = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)

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
    def recall(f: Seq[Double] => DataFrame): (Double, Double) = {
      val rs = queries.map { case (qid, q) =>
        topIds(f(q)).intersect(exact(qid)).size.toDouble / topK
      }
      (rs.sum / rs.size, rs.min)
    }

    val pAdc = recall(q => pq.adcTopK(encPlain, "packed", "vec_id", cbPlain, q, topK))
    val rAdc = recall(q => pq.ivfPqResidualTopK(encResid, "packed", "vec_id",
      "ivf_cell", coarse, cbResid, q, kCent, topK))
    val pRef = recall(q => pq.adcTopKRefined(encPlain, "packed", "vec_id", raw,
      "embedding", cbPlain, q, topK, refine))
    val rRef = recall(q => pq.ivfPqResidualTopK(encResid, "packed", "vec_id",
      "ivf_cell", coarse, cbResid, q, kCent, topK,
      original = Some(raw), refine = refine))

    println(
      f"""{"metric":"pq_residual_ab","dir":"$dir","n":$n,"k_cent":$kCent,"m":$m,"ksub":$ksub,"top_k":$topK,"n_queries":${queries.length},"iters":$iters,"refine_factor":$refine,"quant_err_plain":$errPlain%.6f,"quant_err_resid":$errResid%.6f,"recall_plain_adc":${pAdc._1}%.4f,"recall_resid_adc":${rAdc._1}%.4f,"recall_plain_refine":${pRef._1}%.4f,"recall_resid_refine":${rRef._1}%.4f,"recall_min_plain_adc":${pAdc._2}%.4f,"recall_min_resid_adc":${rAdc._2}%.4f}""")
    spark.stop()
  }
}
