package graft.tools

import graft.operators.{ProductQuantization, SimilaritySearch}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures the MULTIPLICATIVE I/O claim of the composed IVFADC index
  * (`ProductQuantization.ivfPqTopK`): IVF partition pruning reads nprobe/k
  * of the FILES (measured alone in r9_ivf_prune) and PQ codes shrink each
  * file ~20× (measured alone in r10_pq_recall) — composed, the search scan
  * should read ≈ (nprobe/k) · (packed/raw) of the exact baseline's bytes.
  *
  * Layout: one packed-code table written `partitionBy(ivf_cell)` (the
  * production index), the raw vectors kept as a separate unpartitioned
  * table (refine fetches + the exact baseline).
  *
  * I/O accounting: RECORDS come from task `inputMetrics` (exact row-group
  * accounting); BYTES are the on-disk sizes of the files each leg is
  * eligible to touch (the probed cells' partition directories / the raw
  * table) — exact at file granularity because the probe filter is proven
  * partition pruning (r9_ivf_prune: probe cells in `PartitionFilters`).
  * `inputMetrics.bytesRead` is NOT used for bytes here: measured on this
  * corpus it reported 171 KB for a full scan of the 52.7 MB raw table
  * (array<float> column) while reporting 612 KB for a scan of the 3 MB
  * flat packed index — it under-reports the embedding column's data pages
  * by orders of magnitude on the local-fs path, so cross-TABLE byte ratios
  * from it are meaningless (same-table ratios, as in r9_ivf_prune and the
  * flat-schema r10_zorder_scan, track fine). Refine legs add the candidate
  * fetch's records; their disk-touch upper bound is the raw table (point
  * reads at file granularity), reported separately so the composed claim
  * stays conservative.
  *
  * Usage: IvfPqScan <embDir> [kCent=16] [m=8] [ksub=256] [topK=20]
  *                  [nQueries=8] [iters=4] [refine=50]
  */
object IvfPqScan {

  private final class BytesRead extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      Option(te.taskMetrics).foreach { m =>
        bytes.addAndGet(m.inputMetrics.bytesRead)
        records.addAndGet(m.inputMetrics.recordsRead)
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IvfPqScan <embDir> [kCent] [m] [ksub] [topK] [nQueries] [iters] [refine]")
    val dir = args(0)
    val kCent = args.lift(1).map(_.toInt).getOrElse(16)
    val m = args.lift(2).map(_.toInt).getOrElse(8)
    val ksub = args.lift(3).map(_.toInt).getOrElse(256)
    val topK = args.lift(4).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(5).map(_.toInt).getOrElse(8)
    val iters = args.lift(6).map(_.toInt).getOrElse(4)
    val refine = args.lift(7).map(_.toInt).getOrElse(50)
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
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq

    val tB0 = System.nanoTime()
    val cents = SimilaritySearch.kmeansCentroids(emb, "embedding", "vec_id", kCent, iters)
    val cb = pq.trainCodebooks(emb, "embedding", "vec_id", m, ksub, iters)
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq-scan").toString
    SimilaritySearch.assignCells(
        pq.encode(emb, "embedding", cb)
          .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
            col("embedding")),
        "embedding", cents)
      .select(col("vec_id"), col("packed"), col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(s"$tmp/index")
    emb.select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/raw")
    val buildSec = (System.nanoTime() - tB0) / 1e9
    ColumnBridge.unpersistFrame(emb, blocking = true)
    val index = spark.read.parquet(s"$tmp/index")
    val raw = spark.read.parquet(s"$tmp/raw")

    val listener = new BytesRead
    spark.sparkContext.addSparkListener(listener)
    def measured(run: () => Unit): (Double, Long, Long) = {
      run() // warm: footers + codegen outside the record
      ColumnBridge.drainListenerBus(spark)
      val b0 = listener.bytes.get(); val r0 = listener.records.get()
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      (wall, listener.bytes.get() - b0, listener.records.get() - r0)
    }

    def exactAll(): Unit = queries.foreach { q =>
      val v = col("embedding").cast("array<double>")
      val qLit = array(q.map(lit): _*)
      var qq = 0.0; q.foreach(x => qq += x * x)
      raw.select(col("vec_id"),
        (graft.expressions.NativeVec.dot(v, v)
          - lit(2.0) * graft.expressions.NativeVec.dot(v, qLit) + lit(qq)).as("l2"))
        .orderBy(col("l2"), col("vec_id")).limit(topK).collect()
    }
    val exact = measured(() => exactAll())

    // on-disk bytes actually eligible per leg: the probed cells' partition
    // dirs for the index, the whole table for the exact scan
    def treeBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(treeBytes).sum).getOrElse(0L)
    val rawDisk = treeBytes(new java.io.File(s"$tmp/raw"))
    val indexDisk = treeBytes(new java.io.File(s"$tmp/index"))
    def probedDisk(q: Seq[Double], np: Int): Long = {
      val probed = cents.zipWithIndex
        .sortBy { case (c, i) => (-cosQ(q, c), -i) }.take(np).map(_._2)
      probed.map(cell => treeBytes(new java.io.File(s"$tmp/index/ivf_cell=$cell"))).sum
    }
    def cosQ(a: Seq[Double], b: Seq[Double]): Double = {
      var (dt, na, nb) = (0.0, 0.0, 0.0); var i = 0
      val nn = math.min(a.length, b.length)
      while (i < nn) { dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }

    val probes = (Seq(1, 2, 4, 8).filter(_ < kCent) :+ kCent).distinct.sorted
    val exactDiskAll = rawDisk.toDouble * queries.length
    val rows = probes.map { np =>
      val adc = measured(() => queries.foreach { q =>
        pq.ivfPqTopK(index, "packed", "vec_id", "ivf_cell", cents, cb, q,
          np, topK).collect()
      })
      val ref = measured(() => queries.foreach { q =>
        pq.ivfPqTopK(index, "packed", "vec_id", "ivf_cell", cents, cb, q,
          np, topK, original = Some(raw), refine = refine).collect()
      })
      val disk = queries.map(q => probedDisk(q, np)).sum
      System.err.println(f"[ivfpq] nprobe=$np%2d adc_disk=${disk}%10d (${disk / exactDiskAll}%.4f of exact) adc_records=${adc._3}%9d refine_records=${ref._3}%9d")
      f"""{"nprobe":$np,"adc_wall_sec":${adc._1}%.2f,"adc_records":${adc._3},"adc_disk_bytes":$disk,"adc_disk_vs_exact":${disk / exactDiskAll}%.4f,"refine_wall_sec":${ref._1}%.2f,"refine_records":${ref._3}}"""
    }
    println(s"""{"metric":"ivfpq_scan","dir":"$dir","rows":$n,"k_cent":$kCent,"m":$m,"ksub":$ksub,"top_k":$topK,"n_queries":${queries.length},"refine_factor":$refine,"build_sec":${f"$buildSec%.1f"},"exact_wall_sec":${f"${exact._1}%.2f"},"exact_records":${exact._3},"raw_disk_bytes":$rawDisk,"index_disk_bytes":$indexDisk,"index_vs_raw_disk":${f"${indexDisk.toDouble / rawDisk}%.4f"},"probes":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
