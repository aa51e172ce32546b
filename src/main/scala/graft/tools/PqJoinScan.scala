package graft.tools

import graft.operators.{ProductQuantization, SimilaritySearch}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures the BATCH IVFADC search path (`ProductQuantization.ivfPqTopKJoin`)
  * against the single-query loop it replaces, on the same residual index.
  *
  * The claim under test: the single-query loop re-scans its probed cells for
  * EVERY query (records = Σ_q rows(probed(q)) — linear in n_queries), while
  * the batch join scans each probed cell ONCE for the whole query table
  * (records ≈ rows(∪_q probed(q)) — bounded by the index, independent of
  * n_queries once the probe union saturates). Per-query amortized I/O can
  * only fall as the batch grows; the r10_ivfpq_scan single-query bytes are
  * the per-query ceiling.
  *
  * Accounting (the r10_ivfpq_scan discipline): RECORDS from task
  * `inputMetrics` (exact, same-table comparisons only); DISK bytes from the
  * on-disk sizes of the partition dirs each leg is eligible to touch —
  * loop = Σ over queries, batch = the probe UNION — exact at file
  * granularity because the probe filter is proven partition pruning.
  * `inputMetrics.bytesRead` is unreliable across tables with array columns
  * (see IvfPqScan scaladoc) but the index here is flat (id, packed, cell).
  *
  * The smallest leg also asserts batch == loop result equality (the spec
  * pins it exhaustively at fixture scale; this re-checks at corpus scale).
  *
  * `pool=spread` (default) draws queries evenly across the id space — their
  * probe union covers the whole coarse grid, so the batch leg isolates pure
  * scan amortization. `pool=cell0` draws queries from ONE coarse cell —
  * the localized-workload shape (all queries about one region) where the
  * probe UNION stays small and batch amortization COMPOSES with partition
  * pruning (batch_disk ≈ a few cells of the index).
  *
  * Usage: PqJoinScan <embDir> [kCent=16] [m=8] [ksub=256] [topK=20]
  *                   [nprobe=4] [iters=4] [nqList=8,64,512] [pool=spread]
  */
object PqJoinScan {

  private final class Records extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      Option(te.taskMetrics).foreach(m => records.addAndGet(m.inputMetrics.recordsRead))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: PqJoinScan <embDir> [kCent] [m] [ksub] [topK] [nprobe] [iters] [nqList]")
    val dir = args(0)
    val kCent = args.lift(1).map(_.toInt).getOrElse(16)
    val m = args.lift(2).map(_.toInt).getOrElse(8)
    val ksub = args.lift(3).map(_.toInt).getOrElse(256)
    val topK = args.lift(4).map(_.toInt).getOrElse(20)
    val nprobe = args.lift(5).map(_.toInt).getOrElse(4)
    val iters = args.lift(6).map(_.toInt).getOrElse(4)
    val nqList = args.lift(7).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(8, 64, 512))
    val poolMode = args.lift(8).getOrElse("spread")
    require(poolMode == "spread" || poolMode == "cell0", s"bad pool=$poolMode")
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

    // index build: coarse quantizer + RESIDUAL codebooks, partitioned by cell
    val tB0 = System.nanoTime()
    val cents = SimilaritySearch.kmeansCentroids(emb, "embedding", "vec_id", kCent, iters)
    val assigned = SimilaritySearch.assignCells(emb, "embedding", cents).localCheckpoint(true)
    val cb = pq.trainCodebooksResidual(assigned, "embedding", "vec_id",
      "ivf_cell", cents, m, ksub, iters)
    val tmp = java.nio.file.Files.createTempDirectory("pq-join-scan").toString
    pq.encodeResidual(assigned, "embedding", "ivf_cell", cents, cb)
      .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
        col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(s"$tmp/index")
    val buildSec = (System.nanoTime() - tB0) / 1e9
    ColumnBridge.unpersistFrame(emb, blocking = true)
    ColumnBridge.unpersistFrame(assigned, blocking = true)
    val index = spark.read.parquet(s"$tmp/index")

    // query pools: evenly-spread ids (default), or one coarse cell's rows
    // (localized workload — probe unions stay small)
    val ids = (poolMode match {
      case "cell0" => spark.read.parquet(s"$tmp/index")
        .filter(col("ivf_cell") === 0).select(col("vec_id")).orderBy(col("vec_id"))
      case _ => spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id")).orderBy(col("vec_id"))
    }).collect().map(_.getLong(0))
    val poolN = ids.length.toLong
    def pool(nq: Int): Seq[Long] =
      (0 until nq).map(i => ids(((i.toLong * poolN) / nq).toInt)).distinct

    def treeBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(treeBytes).sum).getOrElse(0L)
    def cosQ(a: Seq[Double], b: Seq[Double]): Double = {
      var (dt, na, nb) = (0.0, 0.0, 0.0); var i = 0
      val nn = math.min(a.length, b.length)
      while (i < nn) { dt += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }
    // probe rule: cosine desc, ties to the HIGHER index (assignment rule)
    def probes(q: Seq[Double]): Seq[Int] = cents.zipWithIndex
      .sortBy { case (c, i) => (-cosQ(q, c), -i) }.take(nprobe).map(_._2)
    def cellDisk(cell: Int): Long =
      treeBytes(new java.io.File(s"$tmp/index/ivf_cell=$cell"))

    val listener = new Records
    spark.sparkContext.addSparkListener(listener)
    def measured(run: () => Unit): (Double, Long) = {
      run() // warm: footers + codegen outside the record
      ColumnBridge.drainListenerBus(spark)
      val r0 = listener.records.get()
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      (wall, listener.records.get() - r0)
    }

    val indexDisk = treeBytes(new java.io.File(s"$tmp/index"))
    var equal: Option[Boolean] = None
    val legs = nqList.map { nq =>
      val qids = pool(nq)
      val qdf = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true) // pin the query table in memory: the scan
                               // under measurement is the INDEX side
      val qvecs = qdf.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      val batch = measured(() =>
        pq.ivfPqTopKJoin(qdf, "vec_id", "embedding", index, "packed", "vec_id",
          "ivf_cell", cents, cb, nprobe, topK).collect())
      // loop leg only while it stays affordable (that unaffordability IS the
      // finding; the batch leg keeps running)
      val loop = if (nq <= 64) Some(measured(() => qvecs.foreach { case (_, q) =>
        pq.ivfPqResidualTopK(index, "packed", "vec_id", "ivf_cell", cents, cb,
          q, nprobe, topK).collect()
      })) else None
      if (equal.isEmpty && loop.nonEmpty) {
        val b = pq.ivfPqTopKJoin(qdf, "vec_id", "embedding", index, "packed",
            "vec_id", "ivf_cell", cents, cb, nprobe, topK)
          .as[(Long, Long, Double)].collect().toSet
        val l = qvecs.flatMap { case (qid, q) =>
          pq.ivfPqResidualTopK(index, "packed", "vec_id", "ivf_cell", cents, cb,
            q, nprobe, topK).as[(Long, Double)].collect()
            .map(r => (qid, r._1, r._2))
        }.toSet
        equal = Some(b == l)
      }
      val unionCells = qvecs.flatMap { case (_, q) => probes(q) }.distinct
      val batchDisk = unionCells.map(cellDisk).sum
      val loopDisk = qvecs.map { case (_, q) => probes(q).map(cellDisk).sum }.sum
      ColumnBridge.unpersistFrame(qdf, blocking = true)
      System.err.println(f"[pqjoin] nq=$nq%4d batch=${batch._1}%6.2fs/${batch._2}%9d rec " +
        f"loop=${loop.map(l => f"${l._1}%6.2fs/${l._2}%9d rec").getOrElse("(skipped)")} " +
        f"union_cells=${unionCells.size} batch_disk=$batchDisk loop_disk=$loopDisk")
      f"""{"n_queries":$nq,"batch_wall_sec":${batch._1}%.2f,"batch_records":${batch._2},""" +
        f""""batch_disk_bytes":$batchDisk,"union_cells":${unionCells.size},""" +
        loop.map(l => f""""loop_wall_sec":${l._1}%.2f,"loop_records":${l._2},""").getOrElse("") +
        f""""loop_disk_bytes":$loopDisk,"batch_vs_loop_disk":${batchDisk.toDouble / loopDisk}%.4f}"""
    }
    println(s"""{"metric":"pq_join_scan","dir":"$dir","pool":"$poolMode","rows":$n,"k_cent":$kCent,"m":$m,"ksub":$ksub,"top_k":$topK,"nprobe":$nprobe,"build_sec":${f"$buildSec%.1f"},"index_disk_bytes":$indexDisk,"results_equal_batch_vs_loop":${equal.getOrElse(false)},"legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
