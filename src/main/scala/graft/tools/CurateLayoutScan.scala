package graft.tools

import graft.operators.CurationPipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Measures what `curateForTraining`'s `zorderBy` layout option buys: the
  * SAME curated chunk corpus written twice — hash layout (shard partition,
  * arbitrary order within) vs z-order layout (shard partition, clustered by
  * zValue(source bucket, n_chunk_tokens bucket) within) — then a realistic
  * MIXTURE-SAMPLING scan (per-source + token-length-band predicates, the
  * shape a data-mixture trainer runs per epoch) over both, records read from
  * task `inputMetrics` (flat schema: records track row-group/file pruning).
  *
  * Per-box answers are asserted identical across layouts in-tool (the
  * r10_zorder_scan discipline): layout must never change results, only I/O.
  *
  * Usage: CurateLayoutScan <docsDir> [numShards=8] [maxRecPerFile=4000]
  */
object CurateLayoutScan {

  private final class Records extends SparkListener {
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      Option(te.taskMetrics).foreach(m => records.addAndGet(m.inputMetrics.recordsRead))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CurateLayoutScan <docsDir> [numShards] [maxRecPerFile]")
    val dir = args(0)
    val numShards = args.lift(1).map(_.toInt).getOrElse(8)
    val maxRec = args.lift(2).map(_.toLong).getOrElse(4000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").localCheckpoint(true)
    // a small held-out set exercises the decontamination stage realistically
    val evalDocs = docs.orderBy(col("doc_id")).limit(50)
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    val tmp = java.nio.file.Files.createTempDirectory("curate-layout").toString
    val tC0 = System.nanoTime()
    val chunks = CurationPipeline.curateForTraining(docs, evalDocs, s"$tmp/hash",
      numShards = numShards, passthroughCols = Seq("source"),
      maxRecordsPerFile = maxRec)
    val wHash = (System.nanoTime() - tC0) / 1e9
    val tC1 = System.nanoTime()
    CurationPipeline.curateForTraining(docs, evalDocs, s"$tmp/zorder",
      numShards = numShards, zorderBy = Seq("source", "n_chunk_tokens"),
      maxRecordsPerFile = maxRec)
    val wZorder = (System.nanoTime() - tC1) / 1e9
    val nChunks = chunks.count()
    ColumnBridge.unpersistFrame(docs, blocking = true)

    // mixture-sampling boxes: per-source token-length bands, derived from the
    // live source list so the tool works on any documents corpus
    val sources = spark.read.parquet(s"$tmp/zorder")
      .select(col("source")).distinct().orderBy(col("source"))
      .collect().map(_.getString(0))
    val boxes = for {
      s <- Seq(sources.head, sources(sources.length / 2), sources.last)
      band <- Seq((20L, 40L), (60L, 100L))
    } yield (s, band._1, band._2)

    val listener = new Records
    spark.sparkContext.addSparkListener(listener)
    def leg(layout: String): (Long, Seq[(Long, Long)]) = {
      val df = spark.read.parquet(s"$tmp/$layout")
      def run(): Seq[(Long, Long)] = boxes.map { case (s, a, b) =>
        val r = df.filter(col("source") === s &&
            col("n_chunk_tokens").between(a, b))
          .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      run() // warm footers + codegen
      ColumnBridge.drainListenerBus(spark)
      val r0 = listener.records.get()
      val res = run()
      ColumnBridge.drainListenerBus(spark)
      (listener.records.get() - r0, res)
    }
    val (hashRec, hashRes) = leg("hash")
    val (zRec, zRes) = leg("zorder")
    require(hashRes == zRes,
      s"layouts disagree on box answers: hash=$hashRes zorder=$zRes")
    val matched = hashRes.map(_._1).sum
    def files(p: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      walk(new java.io.File(p))
    }
    System.err.println(f"[curate-layout] chunks=$nChunks boxes=${boxes.size} " +
      f"matched=$matched hash_records=$hashRec zorder_records=$zRec " +
      f"ratio=${hashRec.toDouble / zRec}%.2f")
    println(s"""{"metric":"curate_layout_scan","dir":"$dir","n_chunks":$nChunks,"num_shards":$numShards,"max_records_per_file":$maxRec,"files_hash":${files(s"$tmp/hash")},"files_zorder":${files(s"$tmp/zorder")},"curate_wall_hash_sec":${f"$wHash%.1f"},"curate_wall_zorder_sec":${f"$wZorder%.1f"},"n_boxes":${boxes.size},"rows_matched":$matched,"hash_records_read":$hashRec,"zorder_records_read":$zRec,"hash_over_zorder_records":${f"${hashRec.toDouble / zRec}%.3f"},"answers_equal":true}""")
    spark.stop()
  }
}
