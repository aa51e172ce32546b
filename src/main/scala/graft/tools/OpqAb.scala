package graft.tools

import graft.operators.{ProductQuantization, Rotation, SimilaritySearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rotation-vs-plain PQ A/B at identical code bytes — does the OPQ-style
  * deterministic rotation ([[Rotation]]) buy quantization quality on this
  * corpus? Both arms share the corpus, queries, geometry, training
  * iterations, and exact-L2 ground truth (rotation is an isometry, so the
  * TRUE neighbor sets are identical by construction — asserted in-tool);
  * only the space the codebooks train in differs. Arms: plain_adc /
  * rot_adc (full-scan packed ADC top-k), plain_refine / rot_refine
  * (two-stage). Quantization errors anchor the mechanism: rotation helps
  * exactly when subspace variance is unbalanced, and the per-subspace seed
  * variance spread is reported so the corpus regime is visible in the
  * artifact.
  *
  * Usage: OpqAb <embDir> [m=8] [ksub=256] [topK=20] [nQueries=16] [iters=4]
  *              [refine=10] [seed=42]
  */
object OpqAb {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: OpqAb <embDir> [m] [ksub] [topK] [nQueries] [iters] [refine] [seed]")
    val dir = args(0)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(256)
    val topK = args.lift(3).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(16)
    val iters = args.lift(5).map(_.toInt).getOrElse(4)
    val refine = args.lift(6).map(_.toInt).getOrElse(10)
    val seed = args.lift(7).map(_.toLong).getOrElse(42L)
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
    val rot = Rotation.rotationMatrix(dims, seed)
    val rotated = emb.select(col("vec_id"),
      Rotation.rotate(col("embedding"), rot).as("rv")).localCheckpoint(true)

    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val queryIds = (0 until nQueries)
      .map(i => ids(((i.toLong * n) / nQueries).toInt)).distinct
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
    def rotateQ(q: Seq[Double]): Seq[Double] =
      rot.map { row =>
        var acc = 0.0; var t = 0
        while (t < q.length) { acc += row(t) * q(t); t += 1 }
        acc
      }

    val cbPlain = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val cbRot = pq.trainCodebooks(rotated, "rv", "vec_id", m, ksub, iters)
    val errPlain = pq.quantizationError(emb, "embedding", cbPlain)
    val errRot = pq.quantizationError(rotated, "rv", cbRot)
    // regime indicator: per-subspace variance share of the RAW corpus (the
    // imbalance the rotation exists to flatten)
    val dsub = dims / m
    val subVar = emb.select(posexplode(col("embedding").cast("array<double>")).as(Seq("p", "x")))
      .groupBy((col("p") / dsub).cast("int").as("s"))
      .agg(var_pop(col("x")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val varShares = (0 until m).map(s => subVar.getOrElse(s, 0.0))

    val encPlain = pq.encode(emb, "embedding", cbPlain)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
      .localCheckpoint(true)
    val encRot = pq.encode(rotated, "rv", cbRot)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"))
      .localCheckpoint(true)
    val raw = emb.select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val rawRot = rotated.localCheckpoint(true)

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
    // isometry sanity: rotated-space exact ground truth must be identical
    queries.take(3).foreach { case (qid, q) =>
      val er = exactTopK(rawRot, "rv", rotateQ(q))
      require(er == exact(qid), s"rotation changed exact ground truth for q$qid")
    }
    def topIds(df: DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(f: Seq[Double] => DataFrame, rotQ: Boolean): Double = {
      val rs = queries.map { case (qid, q) =>
        topIds(f(if (rotQ) rotateQ(q) else q)).intersect(exact(qid)).size.toDouble / topK
      }
      rs.sum / rs.size
    }
    val pAdc = recall(q => pq.adcTopK(encPlain, "packed", "vec_id", cbPlain, q, topK), rotQ = false)
    val rAdc = recall(q => pq.adcTopK(encRot, "packed", "vec_id", cbRot, q, topK), rotQ = true)
    val pRef = recall(q => pq.adcTopKRefined(encPlain, "packed", "vec_id", raw,
      "embedding", cbPlain, q, topK, refine), rotQ = false)
    val rRef = recall(q => pq.adcTopKRefined(encRot, "packed", "vec_id", rawRot,
      "rv", cbRot, q, topK, refine), rotQ = true)

    println(
      f"""{"metric":"opq_ab","dir":"$dir","n":$n,"dims":$dims,"m":$m,"ksub":$ksub,"top_k":$topK,"n_queries":${queries.length},"iters":$iters,"refine_factor":$refine,"seed":$seed,"subspace_var_raw":[${varShares.map(v => f"$v%.5f").mkString(",")}],"quant_err_plain":$errPlain%.6f,"quant_err_rot":$errRot%.6f,"recall_plain_adc":$pAdc%.4f,"recall_rot_adc":$rAdc%.4f,"recall_plain_refine":$pRef%.4f,"recall_rot_refine":$rRef%.4f}""")
    spark.stop()
  }
}
