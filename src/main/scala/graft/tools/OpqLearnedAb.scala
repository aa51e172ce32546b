package graft.tools

import graft.operators.{ProductQuantization, Rotation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned-vs-random-vs-none OPQ rotation A/B at identical code bytes — does
  * Ge et al. 2013's actual alternation ([[Rotation.learnedRotation]]:
  * codebooks ↔ Procrustes polar factor) buy quality beyond the fixed random
  * rotation on THIS corpus? All three arms share corpus, queries, geometry,
  * Lloyd iterations, and exact-L2 ground truth (rotations are isometries —
  * asserted in-tool); only the space the codebooks train in differs. The
  * r11_opq_ab bracket showed the random rotation matters exactly where
  * subspace variance is imbalanced (the anisotropic corpus); the learned
  * step should close the remaining gap there and stay level elsewhere.
  *
  * Usage: OpqLearnedAb <embDir> [m=8] [ksub=256] [topK=20] [nQueries=16]
  *                     [lloydIters=4] [outerIters=3] [refine=10] [seed=42]
  */
object OpqLearnedAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: OpqLearnedAb <embDir> [m] [ksub] [topK] [nQueries] [lloydIters] [outerIters] [refine] [seed]")
    val dir = args(0)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(256)
    val topK = args.lift(3).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(16)
    val lloydIters = args.lift(5).map(_.toInt).getOrElse(4)
    val outerIters = args.lift(6).map(_.toInt).getOrElse(3)
    val refine = args.lift(7).map(_.toInt).getOrElse(10)
    val seed = args.lift(8).map(_.toLong).getOrElse(42L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pq = ProductQuantization
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val dims = emb.select(size(col("embedding"))).limit(1).collect()(0).getInt(0)

    val randRot = Rotation.rotationMatrix(dims, seed)
    val (learnRot, cbLearn) = Rotation.learnedRotation(
      emb, "embedding", "vec_id", m, ksub, outerIters, lloydIters, seed)
    def rotDf(rot: Seq[Seq[Double]]): DataFrame =
      emb.select(col("vec_id"), Rotation.rotate(col("embedding"), rot).as("rv"))
        .localCheckpoint(true)
    val rotatedRand = rotDf(randRot)
    val rotatedLearn = rotDf(learnRot)

    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val queryIds = (0 until nQueries)
      .map(i => ids(((i.toLong * n) / nQueries).toInt)).distinct
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
    def apply(rot: Seq[Seq[Double]], q: Seq[Double]): Seq[Double] =
      rot.map { row =>
        var acc = 0.0; var t = 0
        while (t < q.length) { acc += row(t) * q(t); t += 1 }
        acc
      }

    val cbPlain = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, lloydIters)
    val cbRand = pq.trainCodebooks(rotatedRand, "rv", "vec_id", m, ksub, lloydIters)
    val errPlain = pq.quantizationError(emb, "embedding", cbPlain)
    val errRand = pq.quantizationError(rotatedRand, "rv", cbRand)
    val errLearn = pq.quantizationError(rotatedLearn, "rv", cbLearn)

    def enc(df: DataFrame, vc: String, cb: pq.Codebooks): DataFrame =
      pq.encode(df, vc, cb)
        .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
        .localCheckpoint(true)
    val encPlain = enc(emb, "embedding", cbPlain)
    val encRand = enc(rotatedRand, "rv", cbRand)
    val encLearn = enc(rotatedLearn, "rv", cbLearn)
    val raw = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)

    def exactTopK(df: DataFrame, vecCol: String, q: Seq[Double]): Set[Long] = {
      val v = col(vecCol).cast("array<double>")
      val qLit = array(q.map(lit): _*)
      var qq = 0.0; q.foreach(x => qq += x * x)
      df.select(col("vec_id"),
        (graft.expressions.NativeVec.dot(v, v)
          - lit(2.0) * graft.expressions.NativeVec.dot(v, qLit) + lit(qq)).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(topK)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val exact = queries.map { case (qid, q) => qid -> exactTopK(raw, "embedding", q) }.toMap
    // isometry sanity on the learned rotation too
    queries.take(2).foreach { case (qid, q) =>
      val er = exactTopK(rotatedLearn, "rv", apply(learnRot, q))
      require(er == exact(qid), s"learned rotation changed exact ground truth for q$qid")
    }
    def topIds(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(f: Seq[Double] => DataFrame, rot: Option[Seq[Seq[Double]]]): Double = {
      val rs = queries.map { case (qid, q) =>
        topIds(f(rot.fold(q)(apply(_, q)))).intersect(exact(qid)).size.toDouble / topK
      }
      rs.sum / rs.size
    }
    val pAdc = recall(q => pq.adcTopK(encPlain, "packed", "vec_id", cbPlain, q, topK), None)
    val rAdc = recall(q => pq.adcTopK(encRand, "packed", "vec_id", cbRand, q, topK), Some(randRot))
    val lAdc = recall(q => pq.adcTopK(encLearn, "packed", "vec_id", cbLearn, q, topK), Some(learnRot))
    val pRef = recall(q => pq.adcTopKRefined(encPlain, "packed", "vec_id", raw,
      "embedding", cbPlain, q, topK, refine), None)
    val rRef = recall(q => pq.adcTopKRefined(encRand, "packed", "vec_id", rotatedRand,
      "rv", cbRand, q, topK, refine), Some(randRot))
    val lRef = recall(q => pq.adcTopKRefined(encLearn, "packed", "vec_id", rotatedLearn,
      "rv", cbLearn, q, topK, refine), Some(learnRot))

    println(
      f"""{"metric":"opq_learned_ab","dir":"$dir","n":$n,"dims":$dims,"m":$m,"ksub":$ksub,"top_k":$topK,"n_queries":${queries.length},"lloyd_iters":$lloydIters,"outer_iters":$outerIters,"refine_factor":$refine,"seed":$seed,"quant_err_plain":$errPlain%.6f,"quant_err_rand":$errRand%.6f,"quant_err_learned":$errLearn%.6f,"recall_plain_adc":$pAdc%.4f,"recall_rand_adc":$rAdc%.4f,"recall_learned_adc":$lAdc%.4f,"recall_plain_refine":$pRef%.4f,"recall_rand_refine":$rRef%.4f,"recall_learned_refine":$lRef%.4f}""")
    spark.stop()
  }
}
