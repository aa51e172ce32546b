package graft

import org.apache.spark.sql.SparkSession

/** Data-bound scaling series over the heavy dedup / curation / similarity
  * composites — the companion to [[Bench]] (which runs the full suite at one
  * scale). [[Bench]] at sf0.1 is overhead-bound: planning + codegen dominate
  * and every query looks flat. This main runs ONLY the queries whose cost is
  * supposed to grow with data, against [[ScaleData]]-generated ×N corpora, so
  * the recorded series shows how each operator's cost actually scales — the
  * evidence behind the 100 TB design claims (linear-or-sublinear growth,
  * bounded-heap top-k beating the window sort once data dominates).
  *
  * Methodology matches [[Bench]]: fixed-work calibration probes bracket the
  * run, a micro-probe after every query detects external contention, hot
  * queries get one bounded re-run (MIN kept — the right statistic for fixed
  * work under noise), and queries whose attempts all saw hot probes are
  * flagged in the artifact rather than silently inflated.
  *
  * Env: `SPARK_GRAFT_SF_DIR` (the scale dir), `SPARK_GRAFT_SCALE_LABEL`
  * (e.g. "x10"), `SPARK_GRAFT_CPUS`, `SPARK_GRAFT_RERUN_BUDGET`,
  * `SPARK_GRAFT_SCALE_QUERIES` (comma list overriding the default set).
  */
object ScalingBench {

  /** The data-bound set: every heavy composite named in the round-4 verdict
    * (q45–q47, q68, q69, q76, q84, q86, q87, q95, q107, q112 vs q106) plus the
    * exact-dedup / embedding / tf-idf / line-dedup representatives, and — since
    * round 6 — the event-time family's two data-bound members (q22 coverage
    * binning, the reference's one big-data agg; q116 windowed grouped top-k),
    * over [[ScaleData.scaleEvents]] time-axis-replicated corpora. */
  val DefaultQueries: Seq[String] = Seq(
    "q22_coverage_bins",
    "q116_windowed_topk",
    "q44_dedup_exact",
    "q45_dedup_jaccard",
    "q46_dedup_minhash",
    "q47_dedup_simhash",
    "q50_embedding_neardup",
    "q68_dedup_clusters",
    "q69_curation",
    "q76_incremental_dedup",
    "q77_tfidf_topterms",
    "q84_dedup_containment",
    "q86_curated_decontaminated",
    "q87_passage_dedup",
    "q92_line_dedup",
    "q95_semantic_dedup",
    "q106_quality_topm",
    "q107_soft_dedup",
    "q112_group_topk_plan")

  /** Pinned idle-machine references for the two fixed-work probes (same
    * constants [[Bench]] pins): a run whose own probes exceed 2× these
    * declares itself contended in the artifact — the round-7 sparse-corpus
    * A/B measured ±3× identical-config spread with calibrations up to 2.4 s,
    * exactly the condition these fields exist to make self-evident. */
  private val idleCalibrationRefSec = 0.8
  private val idleProbeRefSec = 0.15

  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1L << 24).selectExpr("count(distinct id % 9973)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Same equal-state reset as [[Bench.resetState]]: without it,
    * localCheckpoint blocks from earlier queries accumulate in the block
    * manager and late-suite queries measure storage-eviction + GC thrash
    * instead of their own plan (q84 at ×10: 126 s inside the accumulated
    * suite, 10.9 s from a fresh JVM — the entire apparent super-linearity). */
  private def resetState(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  private def microProbe(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 1L << 19, 1L, 4).selectExpr("count(distinct id % 9973)").collect()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val label = sys.env.getOrElse("SPARK_GRAFT_SCALE_LABEL", "x1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rerunBudget = sys.env.getOrElse("SPARK_GRAFT_RERUN_BUDGET", "600").toDouble
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(DefaultQueries)
    // At ×1000 on one box, 32 partitions carry 1000× the per-partition shuffle
    // bytes of the ×1 leg — the residual super-linear tails are spill, not
    // plan shape. This override is the experiment knob: scaling partitions
    // with data (what a real cluster does by adding executors) should return
    // the growth rate to ≤linear. Default stays = cpus, matching Bench.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    // Extra confs, ';'-separated k=v pairs (e.g. the AQE initialPartitionNum
    // deployment shape: start shuffles wide, let AQE coalesce small stages).
    val extraConfs = sys.env.get("SPARK_GRAFT_EXTRA_CONFS").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("graft.verifyExact", "true")
    // Warm codegen + the scaled documents/embeddings scan paths (untimed).
    spark.range(1 << 20).selectExpr("count(distinct id % 97)").collect()
    Seq("q43_text_fingerprint", "q48_sim_bruteforce").foreach { warm =>
      SparkEntry.queries.get(warm).foreach { fn =>
        try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
      }
    }
    val calibPre = calibrate(spark)
    val probeBase = {
      val ps = (1 to 5).map(_ => microProbe(spark)).sorted
      ps(ps.size / 2)
    }
    def hot(p: Double): Boolean = p > 2.0 * probeBase

    // Re-armed probe (ported from Bench, r8 What's-wrong #4): resetState's
    // blocking unpersist + System.gc return before the ContextCleaner's async
    // reference-queue drain does, and on a single-query scale leg (rerun
    // budget 0) that SELF-INFLICTED drain stamped 2.7–6.8× contended_queries
    // flags on otherwise-clean flagship artifacts (r8 dense q45; r9 q84
    // budget2g, in-query run/cpu 1.18). A hot first probe is re-measured once
    // after a short settle and the min kept — sustained external load
    // inflates both, and bursty load that dodges probes is the in-query
    // run/cpu channel's job.
    def settledProbe(): Double = {
      val a = microProbe(spark)
      if (!hot(a)) a
      else { Thread.sleep(200); math.min(a, microProbe(spark)) }
    }

    // A failed leg must NOT masquerade as a measurement (the Bench lesson,
    // re-learned at x100: a q45 AGGREGATE_OUT_OF_MEMORY abort "ran" for 36 s
    // inside a green-looking artifact). Errors are surfaced, recorded in a
    // `failures` field, and excluded from `queries` and the total.
    def runOnce(name: String): (Double, Option[String]) = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val err = try {
        org.apache.spark.sql.graftbridge.ColumnBridge
          .dropRootSort(fn(spark, sfDir)).queryExecution.toRdd.count()
        None
      } catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(200)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      resetState(spark)
      (dt, err)
    }

    var rerunSpent = 0.0
    val flagged = Seq.newBuilder[(String, Double)]
    val failures = scala.collection.mutable.TreeMap.empty[String, String]
    // Reruns that themselves failed: the clean first-run time is kept, but the
    // intermittent abort is recorded in the artifact (rerun_failures), not
    // only in the log — a one-of-two-runs failure is a flakiness signal.
    val rerunFailures = scala.collection.mutable.TreeMap.empty[String, String]
    // In-query run/cpu contention evidence — see [[graft.tools.TaskClock]]:
    // bursty load dodges the between-query probes but not the queries.
    val clock = new graft.tools.TaskClock(spark)
    val cpuRatios = scala.collection.mutable.TreeMap.empty[String, Double]
    val clockStart = clock.snapshot()
    val results = names.flatMap { name =>
      val clockBefore = clock.snapshot()
      val (t1, e1) = runOnce(name)
      cpuRatios(name) = clock.ratioSince(clockBefore)
      e1 match {
        case Some(err) =>
          failures(name) = err
          System.err.println(s"[scale:$label] $name FAILED: $err")
          None
        case None =>
          val p1 = settledProbe()
          val dt =
            if (!hot(p1)) t1
            else if (rerunSpent + t1 <= rerunBudget) {
              val (t2, e2) = runOnce(name)
              rerunSpent += t2
              val p2 = settledProbe()
              if (hot(p2)) flagged += name -> (math.max(p1, p2) / probeBase)
              if (e2.isDefined) { // flaky rerun: keep the clean time, record the abort
                rerunFailures(name) = e2.get
                System.err.println(s"[scale:$label] $name rerun FAILED (clean first run kept): ${e2.get}")
                t1
              } else math.min(t1, t2)
            } else { flagged += name -> (p1 / probeBase); t1 }
          System.err.println(f"[scale:$label] $name%-28s $dt%8.2fs  probe=${p1 / probeBase}%.2fx")
          Some(name -> dt)
      }
    }
    val calibPost = calibrate(spark)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val flaggedJson = flagged.result().sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
    val failuresJson = failures.map { case (k, v) => s"\"" + k + "\":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val inflationEstimate = math.max(
      math.max(calibPre, calibPost) / idleCalibrationRefSec,
      probeBase / idleProbeRefSec)
    val contendedRun = inflationEstimate > 2.0
    if (contendedRun)
      System.err.println(f"[scale:$label] WARNING: contended run — probes ran $inflationEstimate%.1fx the recorded idle constants; per-query times are inflated")
    val cpuRatioTotal = clock.ratioSince(clockStart)
    val cpuRatiosJson = cpuRatios.map { case (k, v) => s"\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_series","scale":"$label","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calibration_pre_sec":$calibPre,"calibration_post_sec":$calibPost,"probe_base_sec":$probeBase,"idle_calibration_ref_sec":$idleCalibrationRefSec,"idle_probe_ref_sec":$idleProbeRefSec,"contended_run":$contendedRun,"inflation_estimate":${f"$inflationEstimate%.2f"},"run_cpu_ratio_total":${f"$cpuRatioTotal%.2f"},"run_cpu_ratio":$cpuRatiosJson,"contended_queries":$flaggedJson,"rerun_spent_sec":$rerunSpent,"rerun_failures":${rerunFailures.map { case (k, v) => s"\"" + k + "\":" + jstr(v) }.mkString("{", ",", "}")},"failures":$failuresJson,"n_failures":${failures.size}}""")
    spark.stop()
  }
}
