package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B measurement of the skew levers on a Zipf-skewed corpus
  * ([[graft.ScaleData.scaleDocumentsZipf]]: one hot `source` holding ~20% of
  * docs) — the companion evidence to the q114/q115 identity checks, which
  * prove the levers CORRECT but not that they ever pay.
  *
  * Straggler evidence is per-TASK, not per-stage: for each leg the listener
  * records every task's duration, and the artifact carries the worst stage's
  * max-vs-median task ratio. A skewed shuffle shows up as one task holding the
  * hot key's 20% of rows while its 31 siblings finish early — wall clock
  * tracks the straggler, and `task_skew` quantifies it.
  *
  * Legs:
  *   - `join_plain_noaqe` / `join_salted_noaqe`: shuffle join on `source`
  *     against a per-source build side, broadcast + AQE disabled (the regime
  *     [[graft.ops.Skew.saltedJoin]] exists for: AQE-less clusters, or probe
  *     sides AQE's skew splitter won't touch), per-row enrichment after the
  *     join so reducer-side work is proportional to rows received.
  *   - `join_plain_aqe`: same plan with AQE on — records how much of the gap
  *     Spark's own runtime skew-split already closes (the first lever; salting
  *     is for where it can't reach).
  *   - `topk_window` / `topk_grouptopk`: per-source top-5 by quality — window
  *     `row_number` puts the hot source's rows in ONE sort task (AQE cannot
  *     split a window partition), while [[graft.plans.GroupTopK]]'s partial
  *     heaps cut the hot group to k rows per map partition before the
  *     exchange; the skew-immunity of the bounded-heap operator measured, not
  *     just oracle-checked (q112).
  *
  * Also records the q115 [[graft.ops.Skew.capBuckets]] evidence: the
  * bucket-size histogram of blocking-by-`source` and the implied
  * candidate-pair counts with and without the cap. The uncapped pair
  * generation is NOT run — at ×100 the hot bucket alone implies ~5×10⁹ pairs,
  * which is the point: the artifact records the count that makes the leg
  * unrunnable, and times only the capped path.
  *
  * Usage: `runMain graft.tools.SkewBench <zipfDir> <label>`; one JSON line to
  * stdout. Env: `SPARK_GRAFT_CPUS`.
  */
object SkewBench {

  private final case class TaskRow(stageId: Int, durMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SkewBench <zipfDocsDir> <label>")
    val Array(dir, label) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = mutable.ArrayBuffer.empty[TaskRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = tasks.synchronized {
        tasks += TaskRow(ev.stageId, ev.taskInfo.duration)
      }
    })

    def docs = spark.read.parquet(s"$dir/documents.parquet")

    def quality = graft.functions.TextFunctions.qualityScore(col("text"))

    /** Per-source build side, precomputed to keep its derivation out of the
      * timed legs (both join legs consume the identical tiny frame). */
    val buildRows = docs.groupBy(col("source")).agg(count(lit(1)).as("src_docs"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import spark.implicits._
    val build = buildRows.toDF("source", "src_docs")

    /** Reducer-side enrichment + tiny deterministic digest so every leg's
      * result is comparable across variants (same digest ⇒ same rows). */
    def digest(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("rows"),
        sum(pmod(xxhash64(col("doc_id"), col("src_docs")), lit(1000000007L)))
          .as("checksum"))

    /** Post-join enrichment that REFERENCES BOTH SIDES (quality of the probe
      * text scaled by the build side's src_docs): a probe-only expression can
      * be evaluated map-side before the exchange, which would hide the
      * reducer skew this benchmark exists to show; tying it to a build column
      * pins the per-row work to the reducer that received the row. */
    def joinWork(joined: DataFrame): DataFrame =
      digest(joined
        .withColumn("q",
          (quality + graft.functions.TextFunctions.hashedFeatureScore(
            graft.functions.TextFunctions.tokens(col("text"))).cast("double") / 1e6)
            * col("src_docs").cast("double"))
        .filter(col("q") >= -1e18)) // keep q live without changing row count

    def topkDigest(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("rows"),
        sum(pmod(xxhash64(col("doc_id")), lit(1000000007L))).as("checksum"))

    val probe = docs.select(col("doc_id"), col("source"), col("text"))

    final case class StageStat(id: Int, tasks: Int, maxSec: Double,
                               medianSec: Double, skew: Double)

    def run(name: String, confs: Map[String, String])(mk: => DataFrame):
        (String, Double, Seq[Any], Seq[StageStat]) = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      tasks.synchronized(tasks.clear())
      val t0 = System.nanoTime()
      val out = mk.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // listener bus drain
      // Top stages by MAX task time — the straggler lives in the stage whose
      // longest task dominates, and a single "worst stage" row can land on an
      // evenly-loaded scan stage, hiding the skewed exchange; record several.
      val byStage = tasks.synchronized(tasks.groupBy(_.stageId))
        .map { case (sid, ts) =>
          val ds = ts.map(_.durMs.toDouble).sorted
          StageStat(sid, ts.size, ds.last / 1000.0, ds(ds.size / 2) / 1000.0,
            if (ds(ds.size / 2) > 0) ds.last / ds(ds.size / 2) else 0.0)
        }.toSeq.sortBy(-_.maxSec).take(4)
      saved.foreach { case (k, vOpt) =>
        vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val stagesStr = byStage.map(s =>
        f"[${s.id}] tasks=${s.tasks} max=${s.maxSec}%.2fs med=${s.medianSec}%.2fs skew=${s.skew}%.1fx")
        .mkString("  ")
      System.err.println(f"[skew:$label] $name%-20s wall=$wall%7.2fs  $stagesStr")
      (name, wall, out.headOption.map(_.toSeq).getOrElse(Seq.empty), byStage)
    }

    val noAqe = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val aqeOn = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    // warm the scan + codegen paths (untimed)
    probe.select(quality.as("q")).agg(sum(col("q"))).collect()

    val legs = Seq(
      run("join_plain_noaqe", noAqe)(joinWork(probe.join(build, Seq("source")))),
      run("join_salted_noaqe", noAqe)(
        joinWork(graft.ops.Skew.saltedJoin(probe, build, "source", buckets = 32))),
      run("join_plain_aqe", aqeOn)(joinWork(probe.join(build, Seq("source")))),
      // Top-k keeps the DOCUMENT (text rides the shuffle — selecting top docs
      // without their content is not the real operation), which is exactly
      // where the bounded heap pays: the window formulation shuffles and sorts
      // the hot source's full text volume in one task.
      run("topk_window", Map.empty[String, String]) {
        val scored = probe.select(col("doc_id"), col("source"), col("text"),
          quality.as("q"))
        topkDigest(scored
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("q").desc, col("doc_id"))))
          .filter(col("rk") <= 5).drop("rk"))
      },
      run("topk_grouptopk", Map.empty[String, String]) {
        val scored = probe.select(col("doc_id"), col("source"), col("text"),
          quality.as("q"))
        topkDigest(graft.plans.GroupTopK.topK(
          scored, Seq("source"), Seq("q" -> false, "doc_id" -> true), k = 5))
      })

    // q115 capBuckets evidence: blocking by source — bucket histogram and the
    // implied candidate-pair counts with and without the cap. Counts only, no
    // timed uncapped leg: the hot bucket's implied pairs are what make that
    // leg unrunnable, which is the lever's point.
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).collect().map(r => (r.getString(0), r.getLong(1)))
    val pairsUncapped = sizes.map { case (_, n) => n * (n - 1) / 2 }.sum
    val cap = 2L * sizes.map(_._2).sorted.apply(sizes.length / 2) // 2× median bucket
    val pairsCapped = sizes.filter(_._2 <= cap).map { case (_, n) => n * (n - 1) / 2 }.sum
    val hotShare = sizes.head._2.toDouble / sizes.map(_._2).sum

    val legsJson = legs.map { case (name, wall, row, stages) =>
      val extras = row match {
        case Seq(n: Long, cs: Long) => s""","rows":$n,"checksum":$cs"""
        case _ => ""
      }
      val stagesJson = stages.map(s =>
        s"""{"id":${s.id},"tasks":${s.tasks},"max_task_sec":${f"${s.maxSec}%.3f"},"median_task_sec":${f"${s.medianSec}%.3f"},"task_skew":${f"${s.skew}%.2f"}}""")
        .mkString("[", ",", "]")
      s"""{"leg":"$name","wall_sec":${f"$wall%.3f"},"top_stages":$stagesJson$extras}"""
    }.mkString("[", ",", "]")
    val histJson = sizes.take(5).map { case (s, n) => s""""$s":$n""" }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_ab","label":"$label","sf":"$dir","legs":$legsJson,"cap_buckets":{"bucket_top5":$histJson,"hot_bucket_share":${f"$hotShare%.3f"},"cap":$cap,"pairs_uncapped":$pairsUncapped,"pairs_capped":$pairsCapped,"uncapped_leg_run":false,"note":"pair counts implied from bucket sizes; the hot bucket alone makes the uncapped leg unrunnable, which is the lever's point"}}""")
    spark.stop()
  }
}
