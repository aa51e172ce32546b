package graft.tools

import graft.operators.{ProductQuantization, SimilaritySearch}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures full-corpus k-NN GRAPH construction over the quantized index:
  * the ADC batch path (`knnGraphIvfPq`, per-(node, probe) LUT column) vs
  * the SDC path (`knnGraphSdc`, one broadcast m·ksub² table, codes on both
  * sides) — both over the SAME plain-code index, so the only difference is
  * the distance machinery.
  *
  * The claim under test: when the corpus IS the query table, ADC's LUT
  * column (m·ksub doubles ≈ 16 KB/pair at 8×256) becomes the dominant
  * shuffle — n·nprobe·16 KB, corpus-sized — while SDC ships 8-byte codes
  * and ONE table inside the codegen references; shuffle bytes are the
  * headline metric, walls at this scale carry the usual scheduler-floor
  * caveat. Accuracy is the honest counterweight (both sides quantized:
  * SDC recall ≤ ADC recall, Jégou et al. 2011 Table 1), measured against
  * exact ground truth on sampled nodes, plus an exact-refine leg over the
  * SDC graph's widened candidate edges (the recovery path a pipeline
  * would actually run).
  *
  * An exact-graph baseline (crossJoin + native L2 + GroupTopK) runs on a
  * node SUBSAMPLE and extrapolates linearly — the full n² exact graph is
  * the unaffordability being avoided.
  *
  * Usage: KnnGraphScan <embDir> [kCent=64] [m=8] [ksub=256] [k=10]
  *                     [nprobe=1] [iters=4] [recallNodes=16]
  *                     [exactNodes=2000] [refineFactor=5]
  *                     [arms=adc,sdc,refine]
  *
  * `arms` selects which graph arms run — the decade (×1000) leg runs
  * `arms=sdc`: at 2M nodes the ADC arm's LUT column is n·nprobe·16 KB ≈
  * 128 GB of shuffle, and SKIPPING it because it is unaffordable is the
  * measurement (the r10 loop-leg discipline); the computed LUT bytes are
  * reported either way as `adc_lut_bytes_computed`.
  */
object KnnGraphScan {

  private final class Meters extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      Option(te.taskMetrics).foreach { m =>
        records.addAndGet(m.inputMetrics.recordsRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: KnnGraphScan <embDir> [kCent] [m] [ksub] [k] [nprobe] [iters] " +
        "[recallNodes] [exactNodes] [refineFactor]")
    val dir = args(0)
    val kCent = args.lift(1).map(_.toInt).getOrElse(64)
    val m = args.lift(2).map(_.toInt).getOrElse(8)
    val ksub = args.lift(3).map(_.toInt).getOrElse(256)
    val k = args.lift(4).map(_.toInt).getOrElse(10)
    val nprobe = args.lift(5).map(_.toInt).getOrElse(1)
    val iters = args.lift(6).map(_.toInt).getOrElse(4)
    val recallNodes = args.lift(7).map(_.toInt).getOrElse(16)
    val exactNodes = args.lift(8).map(_.toInt).getOrElse(2000)
    val refineFactor = args.lift(9).map(_.toInt).getOrElse(5)
    val arms = args.lift(10).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("adc", "sdc", "refine"))
    require(arms.subsetOf(Set("adc", "sdc", "refine")) && arms("sdc"),
      s"arms must be a subset of adc,sdc,refine and include sdc: $arms")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pq = ProductQuantization
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()

    // shared plain-code index, written partitionBy(cell) like a real one
    val tB0 = System.nanoTime()
    val cents = SimilaritySearch.kmeansCentroids(emb, "embedding", "vec_id", kCent, iters)
    val assigned = SimilaritySearch.assignCells(emb, "embedding", cents).localCheckpoint(true)
    val cb = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val tmp = java.nio.file.Files.createTempDirectory("knn-graph-scan").toString
    pq.encode(assigned, "embedding", cb)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
        col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(s"$tmp/index")
    val buildSec = (System.nanoTime() - tB0) / 1e9
    ColumnBridge.unpersistFrame(assigned, blocking = true)
    val index = spark.read.parquet(s"$tmp/index")

    val meters = new Meters
    spark.sparkContext.addSparkListener(meters)
    def measured(out: String)(df: => DataFrame): (Double, Long, Long, Long) = {
      ColumnBridge.drainListenerBus(spark)
      val r0 = meters.records.get(); val s0 = meters.shuffleWrite.get()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(s"$tmp/$out")
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      val edges = spark.read.parquet(s"$tmp/$out").count()
      (wall, meters.records.get() - r0, meters.shuffleWrite.get() - s0, edges)
    }

    val adc = if (!arms("adc")) None else Some(measured("adc_graph")(
      pq.knnGraphIvfPq(emb, "vec_id", "embedding", index, "packed", "ivf_cell",
        cents, cb, nprobe, k, residual = false, broadcastLuts = false)))
    val sdc = measured("sdc_graph")(
      pq.knnGraphSdc(index, index, "vec_id", "packed", "ivf_cell",
        cents, cb, nprobe, k))
    // SDC + exact refine: widen the SDC graph, re-rank its edges exactly
    val sdcWide = if (!arms("refine")) None else Some(measured("sdc_wide")(
      pq.knnGraphSdc(index, index, "vec_id", "packed", "ivf_cell",
        cents, cb, nprobe, k * refineFactor)))
    val refine = if (!arms("refine")) None else Some {
      ColumnBridge.drainListenerBus(spark)
      val s0 = meters.shuffleWrite.get()
      val t0 = System.nanoTime()
      val edges = spark.read.parquet(s"$tmp/sdc_wide")
        .select(col("query_id"), col("vec_id"))
      val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("_v"))
      val rer = edges
        .join(vecs.select(col("vec_id"), col("_v").as("_xv")), Seq("vec_id"))
        .join(vecs.select(col("vec_id").as("query_id"), col("_v").as("_qv")),
          Seq("query_id"))
        .select(col("query_id"), col("vec_id"),
          (graft.expressions.NativeVec.dot(col("_xv"), col("_xv"))
            - lit(2.0) * graft.expressions.NativeVec.dot(col("_xv"), col("_qv"))
            + graft.expressions.NativeVec.dot(col("_qv"), col("_qv"))).as("l2_dist"))
      graft.plans.GroupTopK.topK(rer, Seq("query_id"),
          Seq("l2_dist" -> true, "vec_id" -> true), k)
        .write.mode("overwrite").parquet(s"$tmp/sdc_refined")
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      (wall, meters.shuffleWrite.get() - s0)
    }

    // recall on sampled nodes vs exact non-self ground truth
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val sample = (0 until recallNodes).map(i => ids(((i.toLong * n) / recallNodes).toInt))
    val qvecs = emb.filter(col("vec_id").isin(sample: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    def exactTopK(qid: Long, q: Seq[Double]): Set[Long] = {
      val v = col("embedding").cast("array<double>")
      val qLit = array(q.map(lit): _*)
      var qq = 0.0; q.foreach(x => qq += x * x)
      emb.filter(col("vec_id") =!= qid)
        .select(col("vec_id"),
          (graft.expressions.NativeVec.dot(v, v)
            - lit(2.0) * graft.expressions.NativeVec.dot(v, qLit) + lit(qq)).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val exact = qvecs.map { case (qid, q) => qid -> exactTopK(qid, q) }
    def recallOf(path: String): Double = {
      val got = spark.read.parquet(s"$tmp/$path")
        .filter(col("query_id").isin(sample: _*))
        .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (qid, ex) =>
        got.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / k }
      rs.sum / rs.size
    }
    val rSdc = recallOf("sdc_graph")
    val rAdc = adc.map(_ => recallOf("adc_graph"))
    val rRef = refine.map(_ => recallOf("sdc_refined"))

    // exact-graph baseline on a node subsample, extrapolated linearly
    val exIds = (0 until exactNodes).map(i => ids(((i.toLong * n) / exactNodes).toInt))
    val exT0 = System.nanoTime()
    val exNodes = emb.filter(col("vec_id").isin(exIds: _*))
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("_qv"))
    val exV = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("_xv"))
    val exPairs = exNodes.crossJoin(exV)
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (graft.expressions.NativeVec.dot(col("_xv"), col("_xv"))
          - lit(2.0) * graft.expressions.NativeVec.dot(col("_xv"), col("_qv"))
          + graft.expressions.NativeVec.dot(col("_qv"), col("_qv"))).as("l2_dist"))
    graft.plans.GroupTopK.topK(exPairs, Seq("query_id"),
        Seq("l2_dist" -> true, "vec_id" -> true), k)
      .write.mode("overwrite").parquet(s"$tmp/exact_sub")
    val exWall = (System.nanoTime() - exT0) / 1e9
    val exFull = exWall * n.toDouble / exIds.length

    // the ADC arm's LUT materialization, computed even when the arm is
    // skipped: n·nprobe pairs × m·ksub doubles — the quantity SDC removes
    val lutBytesComputed = n * nprobe.toLong * m * ksub * 8L
    val adcJson = adc.map(a =>
      f""""adc":{"wall_sec":${a._1}%.1f,"records":${a._2},"shuffle_bytes":${a._3},"edges":${a._4},"recall":${rAdc.get}%.4f},""").getOrElse(
      """"adc":"SKIPPED (arms): LUT materialization alone is adc_lut_bytes_computed",""")
    val wideJson = sdcWide.map(w =>
      f""""sdc_wide_k${k * refineFactor}":{"wall_sec":${w._1}%.1f,"shuffle_bytes":${w._3}},""").getOrElse("")
    val refJson = refine.map(r =>
      f""""sdc_refine":{"wall_sec":${r._1}%.1f,"shuffle_bytes":${r._2},"recall":${rRef.get}%.4f},""").getOrElse("")
    println(
      f"""{"metric":"knn_graph_scan","dir":"$dir","rows":$n,"k_cent":$kCent,"m":$m,"ksub":$ksub,"k":$k,"nprobe":$nprobe,"build_sec":$buildSec%.1f,"adc_lut_bytes_computed":$lutBytesComputed,$adcJson"sdc":{"wall_sec":${sdc._1}%.1f,"records":${sdc._2},"shuffle_bytes":${sdc._3},"edges":${sdc._4},"recall":$rSdc%.4f},$wideJson$refJson"exact_subsample":{"nodes":${exIds.length},"wall_sec":$exWall%.1f,"extrapolated_full_graph_sec":$exFull%.0f},"recall_nodes":$recallNodes}""")
    spark.stop()
  }
}
