package graft.tools

import graft.operators.SimilaritySearch
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures the IVF PARTITION-PRUNING claim (verdict r8 Missing #3): with
  * the cell assignment precomputed and the corpus written
  * `partitionBy(ivf_cell)`, the `ivfTopKAssigned` probe filter must become
  * parquet PARTITION pruning — bytes read ≈ nprobe/kCent of the full scan —
  * rather than a filter evaluated over every file. Records, per probe
  * width: scanned bytes (task inputMetrics summed via listener), wall over
  * `nQueries` searches, and whether the physical plan carries the probe
  * cells in `PartitionFilters` (the plan-shape half of the claim).
  *
  * Ground-truthing is [[IvfRecall]]'s job; this tool is only about I/O.
  * Usage: IvfPrune <embDir> <partDir> [kCent=16] [topK=20] [nQueries=8] [iters=4]
  */
object IvfPrune {

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
    require(args.length >= 2, "usage: IvfPrune <embDir> <partDir> [kCent] [topK] [nQueries] [iters]")
    val dir = args(0)
    val partDir = args(1)
    val kCent = args.lift(2).map(_.toInt).getOrElse(16)
    val topK = args.lift(3).map(_.toInt).getOrElse(20)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(8)
    val iters = args.lift(5).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    // Strided picks can collide (small corpora, skewed strides) and isin()
    // would silently collapse them — dedup here and report the ACTUAL query
    // count below so wall/bytes-per-query comparisons stay honest.
    val queryIds = (0 until nQueries)
      .map(i => ids(((i.toLong * n) / nQueries).toInt)).distinct
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getSeq[Double](1).toSeq).toSeq

    val tTrain0 = System.nanoTime()
    val centroids = SimilaritySearch.kmeansCentroids(emb, "embedding", "vec_id", kCent, iters)
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    // index BUILD: assign once, write partitioned by cell — the one-time cost
    // a production corpus pays so every subsequent search reads nprobe cells
    val tBuild0 = System.nanoTime()
    SimilaritySearch.assignCells(emb, "embedding", centroids)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(partDir)
    val buildSec = (System.nanoTime() - tBuild0) / 1e9
    // Dataset.unpersist is a no-op on a localCheckpointed frame (it only
    // clears CacheManager entries, not the checkpoint's backing RDD blocks);
    // drop the blocks for real so the measured probe legs don't compete with
    // a resident copy of the corpus.
    ColumnBridge.unpersistFrame(emb, blocking = true)
    val part = spark.read.parquet(partDir)

    val listener = new BytesRead
    spark.sparkContext.addSparkListener(listener)
    def measure(nprobe: Int): (Double, Long, Long, Boolean) = {
      ColumnBridge.drainListenerBus(spark)
      val b0 = listener.bytes.get(); val r0 = listener.records.get()
      val t0 = System.nanoTime()
      queries.foreach { q =>
        SimilaritySearch.ivfTopKAssigned(part, "embedding", "vec_id",
          "ivf_cell", centroids, q, nprobe, topK).collect()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      // plan-shape check on the last query's frame: probe cells must appear
      // as PartitionFilters on the scan, not as a post-scan Filter only
      val planStr = SimilaritySearch.ivfTopKAssigned(part, "embedding",
        "vec_id", "ivf_cell", centroids, queries.head, nprobe, topK)
        .queryExecution.executedPlan.toString
      val pruned = planStr.contains("PartitionFilters") &&
        planStr.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("ivf_cell")
      (wall, listener.bytes.get() - b0, listener.records.get() - r0, pruned)
    }
    // full-probe first so codegen/scan warmup is charged to the baseline, not
    // to the pruned legs it would otherwise inflate
    val results = (Seq(kCent) ++ Seq(1, 2, 4, 8).filter(_ < kCent)).map { np =>
      val (wall, bytes, recs, pruned) = measure(np)
      System.err.println(f"[ivfprune] nprobe=$np%2d wall=$wall%7.2fs bytes=$bytes%12d records=$recs%10d partition_pruned=$pruned")
      (np, wall, bytes, recs, pruned)
    }
    val full = results.head
    val rows = results.sortBy(_._1).map { case (np, wall, bytes, recs, pruned) =>
      s"""{"nprobe":$np,"wall_sec":${f"$wall%.2f"},"bytes_read":$bytes,"records_read":$recs,"partition_pruned":$pruned,"bytes_vs_full":${f"${bytes.toDouble / full._3}%.3f"}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ivf_partition_prune","dir":"$dir","k_cent":$kCent,"top_k":$topK,"n_queries":${queries.length},"rows":$n,"train_sec":${f"$trainSec%.1f"},"build_write_sec":${f"$buildSec%.1f"},"probes":$rows}""")
    spark.stop()
  }
}
