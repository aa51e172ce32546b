package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventPipeline._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("windowedCounts over a MemoryStream emits watermarked event-time windows") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventPipeline.windowedCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0), (ts(70), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val h0 = 1700000000000L - (1700000000000L % 3600000L)
      assert(rows((h0, "click")) == (2L, 3.0))
      assert(rows((h0 + 3600000L, "view")) == (1L, 5.0))
    } finally q.stop()
  }

  test("sessionCounts: inactivity gap splits sessions; session end = last event + gap") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    // session-window aggregation supports Append: a session emits only once the
    // watermark passes its end — exactly the bounded-state contract we want
    val q = EventPipeline.sessionCounts(events, gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      // user 7: two events 10 min apart (one session), then one 50 min later (new);
      // user 8: single event
      input.addData((ts(0), 7L, 1.0), (ts(10), 7L, 2.0), (ts(60), 7L, 4.0), (ts(5), 8L, 8.0))
      q.processAllAvailable()
      // advance the watermark past every session end (ts(200) - 1h = ts(140)),
      // then one more batch so the closed sessions flush to the sink
      input.addData((ts(200), 9L, 0.0))
      q.processAllAvailable()
      input.addData((ts(310), 9L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(2), r.getTimestamp(0).getTime) ->
          ((r.getTimestamp(1).getTime, r.getLong(3), r.getDouble(4)))).toMap
      assert(rows((7L, ts(0).getTime)) == ((ts(10).getTime + 30 * 60000L, 2L, 3.0)))
      assert(rows((7L, ts(60).getTime)) == ((ts(60).getTime + 30 * 60000L, 1L, 4.0)))
      assert(rows((8L, ts(5).getTime)) == ((ts(5).getTime + 30 * 60000L, 1L, 8.0)))
      assert(!rows.contains((9L, ts(310).getTime))) // still open — not yet emitted
    } finally q.stop()
  }

  test("project state machine: RUNNING → COMPLETE / FAILED across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StepEvent]
    val q = EventPipeline.trackProjects(input.toDS())
      .writeStream.format("memory").queryName("pt").outputMode(OutputMode.Append()).start()
    try {
      input.addData(StepEvent("PRJ1", "step1", ok = true, ts(0)),
        StepEvent("PRJ2", "step1", ok = false, ts(1)))
      q.processAllAvailable()
      // second batch: state for PRJ1 carries over; step2 completes it
      input.addData(StepEvent("PRJ1", "step2", ok = true, ts(5)))
      q.processAllAvailable()
      val rows = spark.table("pt").collect()
        .map(r => (r.getString(0), r.getString(1))).toList
      assert(rows.contains(("PRJ1", "RUNNING")))
      assert(rows.contains(("PRJ1", "COMPLETE")))
      assert(rows.contains(("PRJ2", "FAILED")))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first arrival per digest across micro-batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.streamingExactDedup(docs, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("sd").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "same text", ts(0)), (2L, "same text", ts(1)), (3L, "other", ts(2)))
      q.processAllAvailable()
      // re-delivery in a later micro-batch, still within the watermark
      input.addData((4L, "same text", ts(3)))
      q.processAllAvailable()
      val ids = spark.table("sd").collect().map(_.getLong(0)).toSet
      assert(ids.intersect(Set(2L, 4L)).isEmpty) // duplicates dropped
      assert(ids.contains(3L))
      assert(ids.intersect(Set(1L, 2L, 4L)).size == 1) // exactly one of the dups survived
    } finally q.stop()
  }

  test("streaming URL frontier dedup drops canonical-variant refetches across batches") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("fetch_id", "url", "ts")
    val q = EventPipeline.streamingUrlDedup(docs, "url", "ts", "1 hour")
      .writeStream.format("memory").queryName("ud").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "https://a.com/p?utm_source=x", ts(0)),
        (2L, "HTTPS://WWW.A.COM/p", ts(1)),       // same canonical as 1
        (3L, "https://b.com/q", ts(2)))
      q.processAllAvailable()
      input.addData((4L, "https://a.com/p/", ts(3))) // later-batch variant, still dropped
      q.processAllAvailable()
      val ids = spark.table("ud").collect().map(_.getLong(0)).toSet
      assert(ids.contains(3L))
      assert(ids.intersect(Set(1L, 2L, 4L)).size == 1) // one survivor per canonical
      assert(!ids.contains(4L))
    } finally q.stop()
  }

  test("streaming near-dup dedup: band collision with an earlier doc drops the arrival") {
    implicit val sc = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.streamingNearDupDedup(docs, "doc_id", "text", "ts",
      watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("ndd").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, base, ts(0)),
        (3L, "totally different words here nothing shared at all in this document", ts(1)))
      q.processAllAvailable()
      // near-identical re-arrival in a later micro-batch: every band collides
      input.addData((10L, base + " nu", ts(2)))
      q.processAllAvailable()
      // watermark driver: push event time far past window 0's end so it emits
      input.addData((99L, "watermark driver event far in the future", ts(120)))
      q.processAllAvailable()
      val ids = spark.table("ndd").collect().map(_.getLong(1)).toSet
      assert(ids.contains(1L) && ids.contains(3L), s"fresh docs must survive: $ids")
      assert(!ids.contains(10L), s"near-dup of doc 1 must be dropped: $ids")
    } finally q.stop()
  }

  test("streaming near-dup dedup: same-batch cluster keeps exactly the min-id copy") {
    implicit val sc = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventPipeline.streamingNearDupDedup(docs, "doc_id", "text", "ts",
      watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("ndd2").outputMode(OutputMode.Append()).start()
    try {
      // both near-dup copies arrive in the SAME micro-batch: an arbitrary-order
      // first-seen dedup could split the band keys between them and drop both;
      // the min-id winner election must keep exactly doc 5
      input.addData(
        (7L, base + " nu", ts(0)),
        (5L, base, ts(1)),
        (3L, "totally different words here nothing shared at all in this document", ts(2)))
      q.processAllAvailable()
      input.addData((99L, "watermark driver event far in the future", ts(120)))
      q.processAllAvailable()
      val ids = spark.table("ndd2").collect().map(_.getLong(1)).toSet
      assert(ids.contains(5L), s"min-id copy of the cluster must survive: $ids")
      assert(!ids.contains(7L), s"higher-id near-dup must be dropped: $ids")
      assert(ids.contains(3L), s"unrelated doc must survive: $ids")
    } finally q.stop()
  }

  test("streaming decontamination: stateless overlap filter against a static eval set") {
    implicit val sc = spark.sqlContext
    val evalSet = Seq((900L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventPipeline.streamingDecontaminate(docs, evalSet, "text", n = 3)
      .writeStream.format("memory").queryName("dec").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "totally unrelated words in this one"),
        (2L, "prefix alpha beta gamma suffix")) // shares shingle "alpha beta gamma"
      q.processAllAvailable()
      input.addData((3L, "beta gamma delta trailing")) // hits in a later batch too
      q.processAllAvailable()
      val ids = spark.table("dec").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L), s"contaminated docs must be dropped in every batch: $ids")
    } finally q.stop()
  }

  test("streaming line filter strips the mined boilerplate set, stateless, every batch") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventPipeline.streamingLineFilter(docs, "text",
      repeatedLines = Seq("subscribe now", "cookie notice"))
      .writeStream.format("memory").queryName("lf").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "real content\nsubscribe now\nmore content"))
      q.processAllAvailable()
      input.addData((2L, "cookie notice"), (3L, "untouched\ndoc"))
      q.processAllAvailable()
      val out = spark.table("lf").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out(1L) === "real content\nmore content")
      assert(out(2L) === "") // boilerplate-only doc survives as empty, caller's policy
      assert(out(3L) === "untouched\ndoc")
    } finally q.stop()
  }

  test("stateless text ops (PII redaction, chunking) run unmodified on streams") {
    implicit val sc = spark.sqlContext
    import graft.functions.TextFunctions
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    import org.apache.spark.sql.functions.col
    // redaction is a pure column expression; chunking is HOF + posexplode —
    // neither needs state, watermarks, or output-mode restrictions
    val q = graft.operators.Chunker.chunkByTokens(
      docs.withColumn("text", TextFunctions.redactPii(col("text"))),
      "doc_id", "text", chunkSize = 4, stride = 3)
      .writeStream.format("memory").queryName("txt").outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "alpha beta gamma delta epsilon zeta eta"),
        (2L, "mail me at someone@example.org today"))
      q.processAllAvailable()
      val rows = spark.table("txt").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      assert(rows.count(_._1 == 1L) == 2) // 7 tokens, c=4 s=3 → 2 chunks
      assert(rows.exists(r => r._1 == 2L && r._3.contains("<email>")))
      assert(!rows.exists(_._3.contains("someone@example.org")))
    } finally q.stop()
  }

  test("streaming BPE tokenization: frozen merges encode arriving docs identical to the batch encoder") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val bpe = graft.operators.BpeTrainer
    // the tokenizer model is TRAINED OFFLINE and frozen; encode is then one
    // stateless native BpeApply per row (merges+vocab ride the plan as a
    // reference object), so fresh documents tokenize in-stream with no
    // state, watermark, or output-mode limits — the q136 chain on a stream
    val corpus = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new new"),
      (3L, "low lowest newer")).toDF("doc_id", "text")
    val merges = bpe.trainMerges(corpus, "text", rounds = 5)
    val voc = bpe.vocab(corpus, "text", merges)
    def encode(df: org.apache.spark.sql.DataFrame) =
      bpe.encodeToIds(df, "text", merges, voc)
        .select(col("doc_id"), col("token_ids"))
    val arrivals = corpus.as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = encode(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bpestream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(arrivals.take(2).toSeq)
      q.processAllAvailable()
      input.addData(arrivals.drop(2).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("bpestream").as[(Long, Seq[Int])]
        .collect().toMap
      val batch = encode(corpus).as[(Long, Seq[Int])].collect().toMap
      assert(streamed == batch,
        "streamed token ids must equal the batch encoder's")
    } finally q.stop()
  }

  test("incremental ANN index ingest: streamed cell-assign + PQ encode appends rows identical to the batch encoder") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val pq = graft.operators.ProductQuantization
    val m = 4; val ksub = 3
    // codebooks and coarse grid are TRAINED OFFLINE and frozen; ingest is
    // then pure stateless column work (native NearestCentroid + PqEncode +
    // packCodes expressions), so new embeddings stream straight into the
    // cell-partitioned index with no state, watermark, or output-mode limits
    val base = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i % 4 * 10 + d) * 2.0 + math.cos(i * 0.7 + d * 0.3) * 0.25))
    }.toDF("vec_id", "embedding")
    val coarse = graft.operators.SimilaritySearch
      .kmeansCentroids(base, "embedding", "vec_id", 3, iters = 2)
    val cb = pq.trainCodebooks(base, "embedding", "vec_id", m, ksub, iters = 2)
    def ingest(df: org.apache.spark.sql.DataFrame) =
      pq.encode(
          graft.operators.SimilaritySearch.assignCells(df, "embedding", coarse),
          "embedding", cb)
        .select(col("vec_id"), pq.packCodes(col("pq_codes"), m, ksub).as("packed"),
          col("ivf_cell"))
    val arrivals = base.as[(Long, Seq[Double])].collect()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = ingest(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("pqidx")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(arrivals.take(12).toSeq)
      q.processAllAvailable()
      input.addData(arrivals.drop(12).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("pqidx").as[(Long, Long, Int)].collect().toSet
      val batch = ingest(base).as[(Long, Long, Int)].collect().toSet
      assert(streamed == batch,
        "streamed index rows must equal the batch encoder's")
    } finally q.stop()
  }

  test("batch shadow: windowedCounts on a static frame equals groupBy semantics") {
    val df = Seq((ts(0), "click", 1.0), (ts(10), "click", 2.0)).toDF("ts", "event_type", "value")
    val out = EventPipeline.windowedCounts(df).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L && out.head.getDouble(3) == 3.0)
  }

  test("streamingGroupTopK: bounded state, Append-on-window-close, equals the batch twin") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val events = input.toDF().toDF("ts", "etype", "uid", "v")
    val q = EventPipeline.streamingGroupTopK(events, "etype", "uid", "v", "ts",
      k = 2, windowLen = "10 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("wtk").outputMode(OutputMode.Append()).start()
    try {
      // one 10-min window, candidates split across TWO micro-batches — the
      // state merge (not just within-batch selection) is what's under test;
      // the 9.0 tie must break toward the smaller id (12 before 13)
      input.addData((ts(1), "g1", 11L, 5.0), (ts(2), "g1", 12L, 9.0), (ts(3), "g2", 21L, 1.0))
      q.processAllAvailable()
      input.addData((ts(4), "g1", 13L, 9.0), (ts(5), "g1", 14L, 7.0))
      q.processAllAvailable()
      assert(spark.table("wtk").isEmpty, "window still open — Append must emit nothing")
      // advance the watermark past the window end, then one more batch to flush
      input.addData((ts(45), "g9", 99L, 1.0))
      q.processAllAvailable()
      input.addData((ts(46), "g9", 98L, 1.0))
      q.processAllAvailable()
      val got = spark.table("wtk").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3), r.getInt(4))).toSet
      val ws = ts(1).getTime - (ts(1).getTime % 600000L)
      assert(got == Set(
        (ws, "g1", 12L, 9.0, 1), (ws, "g1", 13L, 9.0, 2), (ws, "g2", 21L, 1.0, 1)),
        s"unexpected emissions: $got")
      // batch-twin identity on the same closed-window events, and the batch
      // branch must plan through the bounded-heap operator, not a window sort
      val batchDf = Seq((ts(1), "g1", 11L, 5.0), (ts(2), "g1", 12L, 9.0),
        (ts(3), "g2", 21L, 1.0), (ts(4), "g1", 13L, 9.0), (ts(5), "g1", 14L, 7.0))
        .toDF("ts", "etype", "uid", "v")
      val batch = EventPipeline.streamingGroupTopK(batchDf, "etype", "uid", "v", "ts",
        k = 2, windowLen = "10 minutes", watermark = "30 minutes")
      val planStr = batch.queryExecution.executedPlan.toString
      assert(planStr.contains("GroupTopKFinal"),
        "batch branch must route through the GroupTopK operator")
      // the final stage's exchange must be the ONLY one: the rank window
      // reuses the operator's hash partitioning instead of re-shuffling
      assert(planStr.sliding("Exchange".length).count(_ == "Exchange") == 1,
        s"expected exactly one exchange in the batch-twin plan:\n$planStr")
      val batchSet = batch.collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3), r.getInt(4))).toSet
      assert(batchSet == got, s"batch twin diverged: $batchSet vs $got")
    } finally q.stop()
  }

  test("streamingGroupTopK: checkpoint restart recovers state and never re-emits a closed window") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long, Double)]
    val events = input.toDF().toDF("ts", "etype", "uid", "v")
    val ckpt = tempDir().toString
    // The memory sink rejects checkpoint recovery, so the restart contract is
    // asserted on the exactly-once FILE sink: it accumulates across both query
    // incarnations, making a duplicate emission directly visible in the output.
    val out = tempDir().toString
    def start() =
      EventPipeline.streamingGroupTopK(events, "etype", "uid", "v", "ts",
        k = 2, windowLen = "10 minutes", watermark = "30 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    def sink(): Set[(Long, String, Long, Int)] = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getInt(4))).toSet
    val wA = ts(1).getTime - (ts(1).getTime % 600000L)  // window [0,10)
    val wB = ts(21).getTime - (ts(21).getTime % 600000L) // window [20,30)

    // Phase 1: window A fully arrives and CLOSES (emits); window B gets a
    // partial top-k candidate set and stays open in state.
    val q1 = start()
    try {
      input.addData((ts(1), "g1", 11L, 5.0), (ts(2), "g1", 12L, 9.0),
        (ts(21), "g1", 31L, 4.0), (ts(23), "g1", 32L, 6.0))
      q1.processAllAvailable()
      // watermark → ts(45)-30m = 15 min: closes A ([0,10)), leaves B ([20,30))
      input.addData((ts(45), "adv", 99L, 0.0))
      q1.processAllAvailable()
      input.addData((ts(46), "adv", 98L, 0.0))
      q1.processAllAvailable()
      assert(sink() == Set((wA, "g1", 12L, 1), (wA, "g1", 11L, 2)),
        s"phase 1 must emit exactly window A's top-k: ${sink()}")
    } finally q1.stop()

    // Phase 2: resume from the SAME checkpoint. Window B's pre-restart
    // candidates must come back from recovered state (not re-read from the
    // source), merge with post-restart arrivals, and emit exactly once;
    // window A — already committed to the sink — must NOT re-emit.
    val q2 = start()
    try {
      input.addData((ts(24), "g1", 33L, 8.0)) // beats pre-restart 31/32 for rank 1
      q2.processAllAvailable()
      // watermark → ts(100)-30m = 70 min: closes B (and the adv windows)
      input.addData((ts(100), "adv", 97L, 0.0))
      q2.processAllAvailable()
      input.addData((ts(101), "adv", 96L, 0.0))
      q2.processAllAvailable()
      val got = sink()
      assert(got.count(_._1 == wA) == 2 && got.filter(_._1 == wA) ==
        Set((wA, "g1", 12L, 1), (wA, "g1", 11L, 2)),
        s"closed window A must appear EXACTLY once across the restart: $got")
      assert(got.filter(t => t._1 == wB && t._2 == "g1")
        == Set((wB, "g1", 33L, 1), (wB, "g1", 32L, 2)),
        s"window B top-k must merge recovered state with post-restart rows: $got")
      // no (window, group, id) appears twice — the global exactly-once check
      val all = spark.read.parquet(out).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      assert(all.length == all.distinct.length, s"duplicate emissions in sink: ${all.toSeq}")
    } finally q2.stop()
  }

  test("streamingNearDupDedup: checkpoint restart recovers band state; a post-restart near-dup of a pre-restart doc is dropped") {
    implicit val sc = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val ckpt = tempDir().toString
    // File sink (same rationale as the streamingGroupTopK restart case): it
    // accumulates across both query incarnations, so a re-emission of an
    // already-closed window is directly visible.
    val out = tempDir().toString
    def start() =
      EventPipeline.streamingNearDupDedup(docs, "doc_id", "text", "ts",
        watermark = "30 minutes", windowLen = "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append()).start()
    def sink(): Set[(Long, Long)] = spark.read.parquet(out).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSet
    def win(t: Timestamp): Long = t.getTime - (t.getTime % 600000L)
    val wA = win(ts(1))
    val wB = win(ts(21))

    // Phase 1: window A's docs arrive and the window CLOSES (emits both
    // survivors); window B receives doc 21, whose band minima stay OPEN in
    // state across the restart.
    val q1 = start()
    try {
      input.addData(
        (1L, base, ts(1)),
        (3L, "totally different words here nothing shared at all in this document", ts(2)),
        (21L, base + " sigma tau", ts(21)))
      q1.processAllAvailable()
      // watermark driver: ts(45) - 30 min closes A ([..,+10)), leaves B open
      input.addData((99L, "watermark driver alpha unrelated content one", ts(45)))
      q1.processAllAvailable()
      input.addData((98L, "second driver totally distinct vocabulary here", ts(46)))
      q1.processAllAvailable()
      assert(sink() == Set((wA, 1L), (wA, 3L)),
        s"phase 1 must emit exactly window A's survivors: ${sink()}")
    } finally q1.stop()

    // Phase 2: resume from the SAME checkpoint. Doc 23 is a near-dup of
    // PRE-restart doc 21 (same window B): its band keys must collide with
    // 21's recovered minima and lose (21 < 23), so 23 is dropped — if band
    // state had been lost, 23 would win every band and be emitted. Window A,
    // already committed, must not re-emit.
    val q2 = start()
    try {
      input.addData((23L, base + " sigma tau nu", ts(23)))
      q2.processAllAvailable()
      // watermark → ts(100) - 30 min = ts(70): closes B and the driver window
      input.addData((97L, "third driver yet another unshared wordset", ts(100)))
      q2.processAllAvailable()
      input.addData((96L, "fourth driver closing batch distinct tokens", ts(101)))
      q2.processAllAvailable()
      val got = sink()
      assert(got.filter(_._1 == wA) == Set((wA, 1L), (wA, 3L)),
        s"closed window A must appear exactly once across the restart: $got")
      assert(got.contains((wB, 21L)),
        s"pre-restart doc 21 must emit from recovered state when B closes: $got")
      assert(!got.exists(_._2 == 23L),
        s"post-restart near-dup 23 must lose to recovered band minima: $got")
      assert(got.contains((win(ts(45)), 99L)) && got.contains((win(ts(45)), 98L)),
        s"unrelated driver docs must survive their window: $got")
      val all = spark.read.parquet(out).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
      assert(all.length == all.distinct.length, s"duplicate emissions in sink: $all")
    } finally q2.stop()
  }

  test("streaming repetition gate: verdicts identical to the batch filter across micro-batches") {
    implicit val sc = spark.sqlContext
    val clean = "the quick brown fox jumps over a lazy dog near the river bank today"
    val spammy = ("buy cheap pills now " * 12).trim // one dominant 2-gram + dup 5-grams
    val dupLines = Seq.fill(4)("identical boilerplate line").mkString("\n") +
      "\nsome unique content here"
    val rows = Seq((1L, clean), (2L, spammy), (3L, dupLines), (4L, clean + " extra tail"))
    val input = MemoryStream[(Long, String)]
    val q = EventPipeline.streamingRepetitionFilter(input.toDF().toDF("doc_id", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("repf").outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("repf").collect().map(_.getLong(0)).toSet
      val batch = graft.operators.RepetitionStats
        .repetitionFilter(rows.toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batch, "stream and batch verdicts must agree")
      assert(batch.contains(1L) && !batch.contains(2L),
        "the fixture must exercise both verdicts")
    } finally q.stop()
  }

  test("streaming audio ingest: cataloged re-encodes drop via the index, same-window copies via banding") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    val cataloged = Array.tabulate(2048)(t => (((t * 37 + 11) % 1000) + 100).toShort)
    val freshA = Array.tabulate(2048)(t => (((t * t * 91 + 13 * t + 5) % 2000) - 1000).toShort)
    val freshB = Array.tabulate(2048)(t => (((t * 131 + 7) % 4000) - 2000).toShort)
    val driver = Array.tabulate(2048)(t => (((t * 997 + 3) % 3000) - 1500).toShort)
    val idxPath = tempDir().resolve("stream_audioidx").toString
    mm.saveAudioIndex(mm.asMediaFrame(
        Seq((1L, mm.encodeWav(cataloged, 8000))).toDF("media_id", "payload"),
        "media_id", "payload", "audio"), idxPath)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val media = input.toDF().toDF("media_id", "payload", "ts")
    val q = EventPipeline.streamingAudioIngestDedup(media, idxPath, "ts",
      watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("aid").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a re-encode of the CATALOGED clip (drop via index) + fresh A
      input.addData(
        (102L, mm.encodeWav(cataloged, 8000), ts(0)),
        (106L, mm.encodeWav(freshA, 8000), ts(1)))
      q.processAllAvailable()
      // batch 2, same window: a copy of fresh A (drops via in-window banding,
      // min-id winner) + fresh B
      input.addData(
        (107L, mm.encodeWav(freshA, 8000), ts(2)),
        (108L, mm.encodeWav(freshB, 8000), ts(3)))
      q.processAllAvailable()
      // watermark driver far in the future closes window 0
      input.addData((999L, mm.encodeWav(driver, 8000), ts(120)))
      q.processAllAvailable()
      val got = spark.table("aid").collect().map(_.getLong(1)).toSet
      assert(got === Set(106L, 108L),
        s"index dup 102 and same-window copy 107 must drop, got $got")
    } finally q.stop()
  }

  test("streaming tokenizer encode (BPE + unigram): token-identical to the batch encode") {
    implicit val sc = spark.sqlContext
    val corpus = Seq(
      (1L, "abab abab cd"), (2L, "abab cd cd"), (3L, "cd abab abab abab"))
      .toDF("doc_id", "text")
    val bpe = graft.operators.BpeTrainer
    val merges = bpe.trainMerges(corpus, "text", rounds = 3)
    val voc = bpe.vocab(corpus, "text", merges)
    val uni = graft.operators.UnigramLm
    val model = uni.trainUnigram(corpus, "text", maxPieceLen = 4,
      vocabSize = 10, iters = 2)
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val qb = EventPipeline.streamingBpeEncode(docs, "text", merges, voc)
      .select($"doc_id", $"token_ids")
      .writeStream.format("memory").queryName("senc_b")
      .outputMode(OutputMode.Append()).start()
    val qu = EventPipeline.streamingUnigramEncode(docs, "doc_id", "text", model)
      .writeStream.format("memory").queryName("senc_u")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2): _*)
      qb.processAllAvailable(); qu.processAllAvailable()
      input.addData(rows.drop(2): _*)
      qb.processAllAvailable(); qu.processAllAvailable()
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(toMap(spark.table("senc_b"))
        === toMap(bpe.encodeToIds(corpus, "text", merges, voc)
          .select($"doc_id", $"token_ids")),
        "streaming BPE encode must equal the batch encode")
      assert(toMap(spark.table("senc_u"))
        === toMap(uni.encodeUnigramToIds(corpus, "doc_id", "text", model)),
        "streaming unigram encode must equal the batch encode")
    } finally { qb.stop(); qu.stop() }
  }

  test("streaming image ingest: cataloged re-encodes drop via the index, same-window copies via banding") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    // pairwise aHash distances far above maxHamming=3: half-split vs
    // alternating columns vs alternating rows vs first-column-only
    val cataloged = Array.tabulate(64)(p => if (p < 32) 10 else 200)
    val freshA = Array.tabulate(64)(p => if (p % 2 == 0) 200 else 10)
    val freshB = Array.tabulate(64)(p => if ((p / 8) % 2 == 0) 200 else 10)
    val driver = Array.tabulate(64)(p => if (p % 8 == 0) 200 else 10)
    def png(g: Array[Int]) = mm.encodePngGray(8, 8, g)
    val idxPath = tempDir().resolve("stream_imgidx").toString
    mm.saveImageIndex(mm.asMediaFrame(
        Seq((1L, png(cataloged))).toDF("media_id", "payload"),
        "media_id", "payload", "image"), idxPath)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = EventPipeline.streamingImageIngestDedup(
        input.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
        watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("iid").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a re-encode of the CATALOGED image (drop via index) + fresh A
      input.addData((102L, png(cataloged), ts(0)), (106L, png(freshA), ts(1)))
      q.processAllAvailable()
      // batch 2, same window: a copy of fresh A (in-window banding, min-id
      // winner) + fresh B
      input.addData((107L, png(freshA), ts(2)), (108L, png(freshB), ts(3)))
      q.processAllAvailable()
      input.addData((999L, png(driver), ts(120))) // closes window 0
      q.processAllAvailable()
      val got = spark.table("iid").collect().map(_.getLong(1)).toSet
      assert(got === Set(106L, 108L),
        s"index dup 102 and same-window copy 107 must drop, got $got")
    } finally q.stop()
  }

  test("streaming video ingest: cataloged re-encodes and trims drop via the index, same-window copies via the frame-set election") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    def frames(ids: Range, seed: Int): Seq[Array[Int]] =
      ids.map(f => Array.tabulate(64)(p => (37 + 91 * p + p * p + 17 * f + seed) % 256))
    def gif(ids: Range, seed: Int) = mm.encodeGifGray(frames(ids, seed), 8, 8)
    val idxPath = tempDir().resolve("stream_vididx").toString
    mm.saveVideoIndex(mm.asMediaFrame(
        Seq((1L, gif(0 until 6, 0))).toDF("media_id", "payload"),
        "media_id", "payload", "video"), idxPath)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = EventPipeline.streamingVideoIngestDedup(
        input.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
        watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("vid").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a re-encode of the CATALOGED clip and a TRIM of it (both
      // drop via the index containment verify, q163's criterion) + fresh A
      input.addData(
        (102L, gif(0 until 6, 0), ts(0)),
        (60L, gif(1 to 4, 0), ts(1)),
        (106L, gif(0 until 6, 131), ts(2)))
      q.processAllAvailable()
      // batch 2, same window: a lossless re-encode of fresh A (identical
      // distinct-frame-hash set → the election collapses to min id) + fresh B
      input.addData(
        (107L, gif(0 until 6, 131), ts(3)),
        (108L, gif(0 until 6, 67), ts(4)))
      q.processAllAvailable()
      input.addData((999L, gif(0 until 6, 211), ts(120))) // closes window 0
      q.processAllAvailable()
      val got = spark.table("vid").collect().map(_.getLong(1)).toSet
      assert(got === Set(106L, 108L),
        s"index dups 102/60 and same-window copy 107 must drop, got $got")
      // streaming verdicts pin to the batch operator: the same probes against
      // the same index, batch-side
      val batchDropped = mm.videoNearDupAgainstIndex(mm.asMediaFrame(
          Seq((102L, gif(0 until 6, 0)), (60L, gif(1 to 4, 0)),
            (106L, gif(0 until 6, 131)), (108L, gif(0 until 6, 67)))
            .toDF("media_id", "payload"),
          "media_id", "payload", "video"), idxPath)
        .select("id_a").collect().map(_.getLong(0)).toSet
      assert(batchDropped === Set(102L, 60L),
        "batch twin must drop exactly the clips the stream dropped via the index")
    } finally q.stop()
  }

  test("crawl catalog loop: appended survivors drop their re-encodes after query restart") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    val cataloged = Array.tabulate(2048)(t => (((t * 37 + 11) % 1000) + 100).toShort)
    val freshA = Array.tabulate(2048)(t => (((t * t * 91 + 13 * t + 5) % 2000) - 1000).toShort)
    val freshB = Array.tabulate(2048)(t => (((t * 131 + 7) % 4000) - 2000).toShort)
    val driver = Array.tabulate(2048)(t => (((t * 997 + 3) % 3000) - 1500).toShort)
    def wav(s: Array[Short]) = mm.encodeWav(s, 8000)
    def media(rows: (Long, Array[Byte])*) = mm.asMediaFrame(
      rows.toSeq.toDF("media_id", "payload"), "media_id", "payload", "audio")
    val idxPath = tempDir().resolve("crawl_loop_idx").toString
    mm.saveAudioIndex(media(1L -> wav(cataloged)), idxPath)
    // crawl round 1: fresh clip A survives the ingest
    val in1 = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q1 = EventPipeline.streamingAudioIngestDedup(
        in1.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
        watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("crawl1")
      .outputMode(OutputMode.Append()).start()
    try {
      in1.addData((106L, wav(freshA), ts(0)))
      q1.processAllAvailable()
      in1.addData((999L, wav(driver), ts(120)))
      q1.processAllAvailable()
      assert(spark.table("crawl1").collect().map(_.getLong(1)).toSet === Set(106L))
    } finally q1.stop()
    // the accept step: catalog round 1's survivor (writer-lease append)
    mm.appendToAudioIndex(media(106L -> wav(freshA)), idxPath)
    // crawl round 2: the RESTARTED query snapshots the grown index — a
    // re-encode of round 1's survivor now drops via the index; fresh B lives
    val in2 = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q2 = EventPipeline.streamingAudioIngestDedup(
        in2.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
        watermark = "30 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("crawl2")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData((206L, wav(freshA), ts(200)), (208L, wav(freshB), ts(201)))
      q2.processAllAvailable()
      in2.addData((998L, wav(driver), ts(400)))
      q2.processAllAvailable()
      val got = spark.table("crawl2").collect().map(_.getLong(1)).toSet
      assert(got === Set(208L),
        s"cataloged survivor's re-encode must drop after restart, got $got")
    } finally q2.stop()
  }

  test("streaming audio ingest at maxHamming=0: full-width band keys keep distinct clips apart") {
    // exact-dup mode has ONE band of all 64 bits: a zero segMask (the
    // 1L << 64 JVM wrap) would collapse every clip into one bucket and drop
    // all but the min id — two DIFFERENT clips in one window must both survive
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    val cataloged = Array.tabulate(2048)(t => (((t * 37 + 11) % 1000) + 100).toShort)
    val freshA = Array.tabulate(2048)(t => (((t * t * 91 + 13 * t + 5) % 2000) - 1000).toShort)
    val freshB = Array.tabulate(2048)(t => (((t * 131 + 7) % 4000) - 2000).toShort)
    val idxPath = tempDir().resolve("stream_audioidx_h0").toString
    mm.saveAudioIndex(mm.asMediaFrame(
        Seq((1L, mm.encodeWav(cataloged, 8000))).toDF("media_id", "payload"),
        "media_id", "payload", "audio"), idxPath)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val q = EventPipeline.streamingAudioIngestDedup(
        input.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
        watermark = "30 minutes", windowLen = "10 minutes", maxHamming = 0)
      .writeStream.format("memory").queryName("aid0").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (102L, mm.encodeWav(cataloged, 8000), ts(0)), // exact re-encode → index drop
        (106L, mm.encodeWav(freshA, 8000), ts(1)),
        (108L, mm.encodeWav(freshB, 8000), ts(2)))
      q.processAllAvailable()
      // the driver must SURVIVE the index check to advance the watermark —
      // a fresh signal, not a variant of the cataloged clip (a uniform
      // shift keeps the threshold bitmap identical and drops at the index)
      val driver = Array.tabulate(2048)(t => (((t * 997 + 3) % 3000) - 1500).toShort)
      input.addData((999L, mm.encodeWav(driver, 8000), ts(120)))
      q.processAllAvailable()
      val got = spark.table("aid0").collect().map(_.getLong(1)).toSet
      assert(got === Set(106L, 108L),
        s"both distinct fresh clips must survive exact-dup mode, got $got")
    } finally q.stop()
  }

  test("hot-band salting: degenerate image catalog keeps bucket arrays bounded, verdicts unchanged") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    // six catalog images sharing their 16 HIGH aHash bits (half-split base,
    // one distinct last-row pixel each) — pairwise-DISTINCT fingerprints
    // that all land in ONE top-band bucket, the exact hot-band shape a
    // degenerate catalog slice produces
    def grid(flip: Int): Array[Int] =
      Array.tabulate(64)(p => if (p < 32) 200 else if (p == flip) 200 else 10)
    def png(g: Array[Int]) = mm.encodePngGray(8, 8, g)
    val idxPath = tempDir().resolve("hot_imgidx").toString
    mm.saveImageIndex(mm.asMediaFrame(
        (0 until 6).map(i => ((i + 1).toLong, png(grid(56 + i))))
          .toDF("media_id", "payload"),
        "media_id", "payload", "image"), idxPath)
    val freshA = Array.tabulate(64)(p => if (p % 2 == 0) 200 else 10)
    val driver = Array.tabulate(64)(p => if (p % 8 == 0) 200 else 10)
    def run(name: String, maxBucket: Int): Set[Long] = {
      val input = MemoryStream[(Long, Array[Byte], Timestamp)]
      val q = EventPipeline.streamingImageIngestDedup(
          input.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
          watermark = "30 minutes", windowLen = "10 minutes",
          maxBucket = maxBucket)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((102L, png(grid(56)), ts(0)), (106L, png(freshA), ts(1)))
        q.processAllAvailable()
        input.addData((999L, png(driver), ts(120))) // closes window 0
        q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(1)).toSet
      } finally q.stop()
    }
    // maxBucket=2 forces the 6-entry hot bucket into 3 salt sub-buckets;
    // the unbounded run is the reference verdict
    val salted = run("hotimg_s", 2)
    val plain = run("hotimg_p", Int.MaxValue)
    assert(salted === plain, "salting must not change verdicts")
    assert(salted === Set(106L),
      s"catalog re-encode 102 must drop via a salted sub-bucket, got $salted")
  }

  test("hot-band salting: degenerate video catalog (shared frame) bounded, verdicts unchanged") {
    implicit val sc = spark.sqlContext
    val mm = graft.operators.Multimodal
    // six catalog clips ALL containing the same constant frame (fp 0 — the
    // all-black-frame degeneracy) plus one distinct frame each: the
    // constant frame's band buckets hold six (id, fp) candidates
    val const = Array.fill(64)(128)
    def uniq(seed: Int): Array[Int] =
      Array.tabulate(64)(p => (37 + 91 * p + p * p + 17 * seed) % 256)
    def gif(fs: Seq[Array[Int]]) = mm.encodeGifGray(fs, 8, 8)
    val idxPath = tempDir().resolve("hot_vididx").toString
    mm.saveVideoIndex(mm.asMediaFrame(
        (0 until 6).map(i => ((i + 1).toLong, gif(Seq(const, uniq(i)))))
          .toDF("media_id", "payload"),
        "media_id", "payload", "video"), idxPath)
    def run(name: String, maxBucket: Int): Set[Long] = {
      val input = MemoryStream[(Long, Array[Byte], Timestamp)]
      val q = EventPipeline.streamingVideoIngestDedup(
          input.toDF().toDF("media_id", "payload", "ts"), idxPath, "ts",
          watermark = "30 minutes", windowLen = "10 minutes",
          maxBucket = maxBucket)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // 102: re-encode of catalog clip 3 (containment 1.0 → index drop);
        // 106: fresh clip, both frames far from the catalog → survives
        input.addData(
          (102L, gif(Seq(const, uniq(2))), ts(0)),
          (106L, gif(Seq(uniq(131), uniq(67))), ts(1)))
        q.processAllAvailable()
        input.addData((999L, gif(Seq(uniq(211))), ts(120))) // closes window 0
        q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(1)).toSet
      } finally q.stop()
    }
    val salted = run("hotvid_s", 2)
    val plain = run("hotvid_p", Int.MaxValue)
    assert(salted === plain, "salting must not change verdicts")
    assert(salted === Set(106L),
      s"catalog re-encode 102 must drop via a salted sub-bucket, got $salted")
  }
}
