package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew + bucketing shapes: correctness of the salted rewrites and plan-level
  * assertions that bucketing actually removes exchanges. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals plain aggregation (count + sum)") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAggregate(df, Seq("k"), buckets = 8,
      saltCols = Seq(col("v")),
      partial = Seq(count(lit(1)).as("n_p"), sum("v").as("s_p")),
      finalAgg = Seq(sum("n_p").as("n"), sum("s_p").as("s")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val probe = (1 to 500).map(i => (if (i % 5 == 0) "hot" else s"k${i % 50}", i))
      .toDF("k", "pv")
    val build = Seq(("hot", 1), ("k1", 2), ("k2", 3)).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = Skew.saltedJoin(probe, build, "k", buckets = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("capBuckets drops non-discriminative buckets only") {
    val df = (1 to 100).map(i => (if (i <= 90) "big" else s"b$i", i)).toDF("bucket", "id")
    val kept = Skew.capBuckets(df, Seq("bucket"), maxBucket = 10)
    assert(kept.count() == 10 && kept.filter(col("bucket") === "big").count() == 0)
  }

  test("embeddingNearDupPairs routes oversized blocks through sign-LSH — the quadratic guard (q50)") {
    import graft.operators.SimilaritySearch
    // "big" block (50 identical vectors) exceeds maxBlock → never enters the exact
    // all-pairs, but its near-dups are still FOUND via the (block, lsh) sub-bucket
    // route; the discriminative "small" block stays on the exact path.
    val rows = (1 to 50).map(i => (i.toLong, Array(1f, 0f), "big")) ++
      Seq((100L, Array(1f, 0f), "small"), (101L, Array(1f, 0.01f), "small"))
    val df = rows.toDF("vec_id", "embedding", "label")
    val routed = SimilaritySearch.embeddingNearDupPairs(df, "embedding", "vec_id",
      "label", threshold = 0.9, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed.contains((100L, 101L)))         // exact path untouched
    assert(routed.contains((1L, 2L)))             // over-cap pair recovered via LSH
    // identical vectors always share the full LSH bucket → all 50·49/2 big pairs
    assert(routed.size == 50 * 49 / 2 + 1)

    // overCapPlanes = Some(Nil) restores the documented drop-oversized-blocks behavior
    val excluded = SimilaritySearch.embeddingNearDupPairs(df, "embedding", "vec_id",
      "label", threshold = 0.9, maxBlock = 10, overCapPlanes = Some(Nil))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(excluded == Set((100L, 101L)))
  }

  test("over-cap planes derive their dimensionality from the data (32-dim recall)") {
    import graft.operators.SimilaritySearch
    // 30 near-identical 32-dim vectors in one over-cap block: with planes derived
    // at 32 dims every pair lands in the same LSH sub-bucket and is recovered;
    // a fixed 64-dim default would dot only the first 32 plane components against
    // 32-dim data — recall would silently depend on truncated planes.
    val base = Array.tabulate(32)(d => math.cos(d * 0.37).toFloat)
    val rows = (1 to 30).map { i =>
      val v = base.clone(); v(i % 32) = v(i % 32) + 0.001f * (i % 3)
      (i.toLong, v, "blk")
    }
    val pairs = SimilaritySearch.embeddingNearDupPairs(rows.toDF("vec_id", "embedding", "label"),
      "embedding", "vec_id", "label", threshold = 0.999, maxBlock = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 30 * 29 / 2, s"expected full recall, got ${pairs.size}")
    // explicit planes of the WRONG width are rejected, not silently degraded
    val err = intercept[IllegalArgumentException] {
      SimilaritySearch.embeddingNearDupPairs(rows.toDF("vec_id", "embedding", "label"),
        "embedding", "vec_id", "label", threshold = 0.999, maxBlock = 5,
        overCapPlanes = Some(SimilaritySearch.deterministicPlanes(12, 64)))
    }
    assert(err.getMessage.contains("64-dim") && err.getMessage.contains("32-dim"))
  }

  test("adaptiveDepth: floored small, log-growth large — the linear-pair-work guarantee") {
    import graft.operators.SimilaritySearch.adaptiveDepth
    assert(adaptiveDepth(0, 12) == 12)            // empty → floor
    assert(adaptiveDepth(16, 12, 16) == 12)       // n <= target → floor
    assert(adaptiveDepth(200, 6, 32) == 6)        // sf0.01 corpus pins to floor 6
    assert(adaptiveDepth(2000, 6, 32) == 6)       // sf0.1 corpus still floor 6
    assert(adaptiveDepth(20000, 6, 32) == 10)     // x10 corpus deepens
    assert(adaptiveDepth(1L << 24, 12, 16) == 20) // 16M rows / 16-target → 2^20 buckets
    // doubling n adds at most one plane → expected bucket population bounded
    assert(adaptiveDepth(1L << 25, 12, 16) == 21)
    intercept[IllegalArgumentException](adaptiveDepth(10, -1))
    intercept[IllegalArgumentException](adaptiveDepth(10, 12, 0))
  }

  test("semanticDedupAuto pins to the floor depth on small corpora — oracle anchor (q95)") {
    import graft.operators.SimilaritySearch
    val rows = (1 to 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat), ())
    }.map { case (id, v, _) => (id, v) }
    val df = rows.toDF("vec_id", "embedding")
    val auto = SimilaritySearch.semanticDedupAuto(df, "embedding", "vec_id",
      threshold = 0.9, floor = 6, target = 32L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    val fixed = SimilaritySearch.semanticDedup(df, "embedding", "vec_id",
      SimilaritySearch.deterministicPlanes(6, 8), threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(auto == fixed && auto.nonEmpty)
  }

  test("over-cap LSH route stays block-local: same lsh bucket, different block → no pair") {
    import graft.operators.SimilaritySearch
    // two over-cap blocks of identical vectors: every vector shares the same LSH
    // bits, but pairs must never cross the coarse-partition boundary
    val rows = (1 to 20).map(i => (i.toLong, Array(1f, 0f), "blkA")) ++
      (21 to 40).map(i => (i.toLong, Array(1f, 0f), "blkB"))
    val pairs = SimilaritySearch.embeddingNearDupPairs(rows.toDF("vec_id", "embedding", "label"),
      "embedding", "vec_id", "label", threshold = 0.9, maxBlock = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => (a <= 20) == (b <= 20) },
      s"found a cross-block pair in: $pairs")
  }

  test("interval overlap join plans as an equi-join, never a nested loop") {
    val iv = (1 to 500).map(i => ("k" + i % 3, i.toLong, i.toLong * 10, i.toLong * 10 + 25))
      .toDF("key", "iid", "start", "end")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = IntervalJoin.overlapPairs(iv, iv, Seq("key"), "iid",
        "start", "end", binSize = 100L, selfJoin = true)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join must stay an equi-join on (keys, bin):\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join plans with NO join operator at all (union + window)") {
    val l = Seq(("A", 1L, 5L)).toDF("k", "lid", "t")
    val r = Seq(("A", 2L, 3L)).toDF("k", "rid", "t")
    val j = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", payloadCols = Seq("rid"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not contain a physical join:\n$plan")
    assert(plan.contains("Window"))
  }

  test("scan-side text ops prune columns and stay in one codegen stage (q64-class)") {
    import graft.functions.TextFunctions
    val dir = java.nio.file.Files.createTempDirectory("graft-scan").toString
    (1 to 50).map(i => (i.toLong, s"doc $i text", s"extra $i", i * 1.0))
      .toDF("doc_id", "text", "unused_a", "unused_b")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .select(col("doc_id"), TextFunctions.bpeTokenCount(col("text")).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"pure per-row op must not shuffle:\n$plan")
    // column pruning: the scan must read only the two referenced columns
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("doc_id") && scan.contains("text"))
    assert(!scan.contains("unused_a") && !scan.contains("unused_b"),
      s"scan must prune unused columns:\n$scan")
  }

  test("repetition signals are scan-side: no shuffle, no explode (q73)") {
    import graft.functions.TextFunctions
    val docs = (1 to 50).map(i => (i.toLong, s"w$i w$i w${i + 1}")).toDF("doc_id", "text")
    val q = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextFunctions.distinctTokenFraction(col("toks")).as("dtf"),
        TextFunctions.topGramFraction(TextFunctions.wordShinglesOf(col("toks"), 2)).as("tbf"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-doc fold must not shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"must not explode n-grams:\n$plan")
  }

  test("stratifiedLimit shuffles once by group; trim windows only distinct values (q74/q75)") {
    import graft.operators.Sampling
    val docs = (1 to 100).map(i => (i.toLong, s"g${i % 4}", (i % 10).toLong))
      .toDF("doc_id", "grp", "v")
    val s = Sampling.stratifiedLimit(docs, "grp", "doc_id", m = 5)
    val sPlan = s.queryExecution.executedPlan.toString
    assert(sPlan.split("Exchange").length - 1 <= 1,
      s"per-group limit should shuffle once (by group):\n$sPlan")
    // trim: the single-partition window input is the per-value count table —
    // its Aggregate must sit BELOW the Window in the plan
    val t = Sampling.trimByValueQuantile(docs, "v", 0.1, 0.9)
    val tPlan = t.queryExecution.optimizedPlan.toString
    val winIdx = tPlan.indexOf("Window")
    assert(winIdx >= 0 && tPlan.indexOf("Aggregate", winIdx) >= 0,
      s"window must run over the aggregated distinct-value table:\n$tPlan")
    assert(t.count() == 90L)
  }

  test("session-window aggregation plans a single shuffle by user (q66-class)") {
    val ev = (1 to 100).map(i => (new java.sql.Timestamp(1700000000000L + i * 60000L),
      (i % 7).toLong, i * 1.0)).toDF("ts", "user_id", "value")
    val q = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"session windows should shuffle once:\n$plan")
  }

  test("embeddingNearDupPairs keeps equi-join keys (block, sub) — no nested loop (q50)") {
    import graft.operators.SimilaritySearch
    val rows = (1 to 200).map(i => (i.toLong, Array(1f, 0.01f * i), s"b${i % 5}"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = SimilaritySearch.embeddingNearDupPairs(rows.toDF("vec_id", "embedding", "label"),
        "embedding", "vec_id", "label", threshold = 0.9, maxBlock = 10)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"pair generation must stay an equi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join plans without exchanges; values match plain join") {
    Seq("bt_left", "bt_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val l = (1 to 200).map(i => (i.toLong % 40, s"l$i")).toDF("k", "lv")
    val r = (1 to 100).map(i => (i.toLong % 40, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(l, "bt_left", "k", 8)
    Bucketing.writeBucketed(r, "bt_right", "k", 8)
    // disable broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing.bucketedJoin(spark, "bt_left", "bt_right", "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should be exchange-free:\n$plan")
      assert(j.count() == l.join(r, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("decontamination broadcasts the eval side — the corpus is never shuffled to find overlap (q79)") {
    val corpus = (1 to 200).map(i => (i.toLong, s"alpha beta w$i gamma delta epsilon")).toDF("doc_id", "text")
    val evalSet = Seq((900L, "alpha beta gamma")).toDF("doc_id", "text")
    val report = graft.operators.Decontamination
      .contaminationReport(corpus, evalSet, "doc_id", "text", n = 3)
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
    val kept = graft.operators.Decontamination
      .decontaminate(corpus, evalSet, "doc_id", "text", n = 3)
    val kplan = kept.queryExecution.executedPlan.toString
    // both joins (gram hit + id anti) build on the broadcast side
    assert(!kplan.contains("SortMergeJoin"), s"anti-join must broadcast too:\n$kplan")
  }

  test("chunking is scan-side: no shuffle anywhere in the plan (q82)") {
    val df = (1 to 50).map(i => (i.toLong, (1 to 40).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val q = graft.operators.Chunker.chunkByTokens(df, "doc_id", "text", 16, 12)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), "chunks materialize via explode, not a join")
  }

  test("PII redaction and URL hygiene are scan-side column expressions (q80/q81)") {
    import graft.functions.TextFunctions
    val df = (1 to 50).map(i => (i.toLong, s"doc $i mail u$i@x.org")).toDF("doc_id", "text")
    val q = df.select(col("doc_id"), TextFunctions.redactPii(col("text")).as("red"),
      TextFunctions.urlHost(concat(lit("https://h"), col("doc_id").cast("string"),
        lit(".example.com/p"))).as("host"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"redaction must not shuffle:\n$plan")
  }
}
