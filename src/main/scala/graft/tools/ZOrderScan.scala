package graft.tools

import graft.operators.Layout
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures what the Z-order layout buys at the parquet scan: the SAME box
  * predicate (`x BETWEEN … AND y BETWEEN …`) over three physical layouts of
  * the SAME rows —
  *   unsorted  (hash repartition: no clustering, the pipeline-default sin),
  *   linear    (range-sorted by x only: prunes x, blind to y),
  *   zorder    (range-sorted by the interleaved z-value: prunes both).
  * Row-group min/max stats do the pruning (spark.sql.parquet.filterPushdown);
  * task `inputMetrics` records bytes/records actually read. Per-box result
  * checksums must be identical across layouts — a layout that changes
  * ANSWERS is a bug, not an optimization.
  *
  * Dimensions are realistic curation-query axes: x = char-length bucket,
  * y = arrival-order bucket (doc_id rank) — measured near-zero correlation,
  * so linear-by-x genuinely cannot help y.
  *
  * Usage: ZOrderScan <docsDir> [bits=10] [numFiles=64] [nBoxes=6] [boxBits=7]
  * One JSON line on stdout.
  */
object ZOrderScan {

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
    require(args.nonEmpty, "usage: ZOrderScan <docsDir> [bits] [numFiles] [nBoxes] [boxBits]")
    val dir = args(0)
    val bits = args.lift(1).map(_.toInt).getOrElse(10)
    val numFiles = args.lift(2).map(_.toInt).getOrElse(64)
    val nBoxes = args.lift(3).map(_.toInt).getOrElse(6)
    val boxBits = args.lift(4).map(_.toInt).getOrElse(7)
    // boxes must fit strictly inside the domain: boxBits >= bits makes
    // dom - side <= 0 below (modulo-by-zero or negative corners)
    require(boxBits < bits, s"boxBits=$boxBits must be < bits=$bits")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val side = 1L << boxBits
    val dom = 1L << bits
    // x: content-size bucket; y: arrival-order bucket — scaled by MAX id, not
    // row count: replicated corpora carry sparse per-replica id offsets, and
    // count-scaling collapses every row past replica 0 into bucket 1023 (the
    // first run of this tool did exactly that — rows_matched was scale-
    // invariant because only replica 0 could ever match a y box).
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val base = docs.select(col("doc_id"),
        Layout.bucket(col("n_chars"), bits).as("x"),
        Layout.bucket(col("doc_id") * dom / lit(maxId + 1), bits).as("y"),
        col("source"))
      .localCheckpoint(true)

    val tmp = java.nio.file.Files.createTempDirectory("zorder-scan").toString
    val tW0 = System.nanoTime()
    base.repartition(numFiles).write.mode("overwrite").parquet(s"$tmp/unsorted")
    val wUnsorted = (System.nanoTime() - tW0) / 1e9
    val tW1 = System.nanoTime()
    Layout.linearWrite(base, col("x"), s"$tmp/linear", numFiles)
    val wLinear = (System.nanoTime() - tW1) / 1e9
    val tW2 = System.nanoTime()
    Layout.zorderWrite(base, Seq(col("x"), col("y")), bits, s"$tmp/zorder", numFiles)
    val wZorder = (System.nanoTime() - tW2) / 1e9
    ColumnBridge.unpersistFrame(base, blocking = true)

    // deterministic spread of box corners (coprime strides walk the domain)
    val boxes = (0 until nBoxes).map { i =>
      val x0 = (i * 997L) % (dom - side)
      val y0 = (i * 613L) % (dom - side)
      (x0, x0 + side - 1, y0, y0 + side - 1)
    }
    val listener = new BytesRead
    spark.sparkContext.addSparkListener(listener)

    def leg(layout: String): (Double, Long, Long, Seq[(Long, Long)]) = {
      val df = spark.read.parquet(s"$tmp/$layout")
      def run(): Seq[(Long, Long)] = boxes.map { case (x0, x1, y0, y1) =>
        val r = df.filter(col("x").between(x0, x1) && col("y").between(y0, y1))
          .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      run() // warm pass: footer caches + codegen charged outside the record
      ColumnBridge.drainListenerBus(spark)
      val b0 = listener.bytes.get(); val r0 = listener.records.get()
      val t0 = System.nanoTime()
      val sums = run()
      val wall = (System.nanoTime() - t0) / 1e9
      ColumnBridge.drainListenerBus(spark)
      (wall, listener.bytes.get() - b0, listener.records.get() - r0, sums)
    }

    val legs = Seq("unsorted", "linear", "zorder").map(l => l -> leg(l)).toMap
    // answers must be layout-invariant
    val Seq(su, sl, sz) = Seq("unsorted", "linear", "zorder").map(legs(_)._4)
    require(su == sl && sl == sz,
      s"layouts disagree on box results: unsorted=$su linear=$sl zorder=$sz")
    val full = legs("unsorted")
    def row(l: String): String = {
      val (wall, bytes, recs, _) = legs(l)
      f"""{"layout":"$l","wall_sec":$wall%.2f,"bytes_read":$bytes,"records_read":$recs,"bytes_vs_unsorted":${bytes.toDouble / full._2}%.4f,"records_vs_unsorted":${recs.toDouble / full._3}%.4f}"""
    }
    val matched = su.map(_._1).sum
    println(s"""{"metric":"zorder_scan","dir":"$dir","rows":$n,"bits":$bits,"num_files":$numFiles,"n_boxes":$nBoxes,"box_side":$side,"rows_matched":$matched,"write_sec":{"unsorted":${f"$wUnsorted%.1f"},"linear":${f"$wLinear%.1f"},"zorder":${f"$wZorder%.1f"}},"legs":[${row("unsorted")},${row("linear")},${row("zorder")}]}""")
    spark.stop()
  }
}
