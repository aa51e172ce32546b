package graft

import org.apache.spark.sql.functions._

/** [[ScaleData]] is the evidence generator for the scaling bench — if its
  * structure-preservation claims are wrong, the whole series measures the
  * wrong thing. These specs pin the three claims the scaladoc makes:
  *
  *   1. documents: per-replica token/gram structure is an isomorphic image of
  *      the base corpus (same token counts), and replicas share NO tokens
  *      (candidate pairs scale ×N, never ×N²);
  *   2. embeddings: the per-replica shift+sign-flip is an exact isometry of
  *      the dot product (within-replica similarity structure bit-preserved);
  *   3. ids: globally unique across replicas (disjoint stride ranges).
  */
class ScaleDataSpec extends SparkSpec {

  private lazy val srcDir: String = {
    val dir = tempDir().toString
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "web"),
      (2L, "pack my box with five dozen liquor jugs", "en", "web"),
      (3L, "the quick brown fox jumps over the lazy dog", "en", "books"),
      (4L, "sphinx of black quartz judge my vow", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq(
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f), "a"),
      (2L, Array(0.0f, -1.0f, 2.0f, 4.0f), "a"),
      (3L, Array(2.0f, 2.0f, 2.0f, 2.0f), "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("scaleDocuments: row count ×N, ids globally unique, replica 0 verbatim") {
    val out = ScaleData.scaleDocuments(spark, srcDir, 3).cache()
    assert(out.count() === 12)
    assert(out.select("doc_id").distinct().count() === 12)
    val base = spark.read.parquet(s"$srcDir/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(col("doc_id") < ScaleData.IdStride).collect().foreach { r =>
      assert(r.getAs[String]("text") === base(r.getAs[Long]("doc_id")))
    }
  }

  test("scaleDocuments: per-replica token counts preserved; no cross-replica token collisions") {
    val out = ScaleData.scaleDocuments(spark, srcDir, 3)
    val toks = out.select(
      (col("doc_id") / ScaleData.IdStride).cast("int").as("r"),
      explode(split(col("text"), "\\s+")).as("tok"))
    // token count per replica == base token count (isomorphic image)
    val baseTokens = spark.read.parquet(s"$srcDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+"))).count()
    val perReplica = toks.groupBy("r").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perReplica === Map(0 -> baseTokens, 1 -> baseTokens, 2 -> baseTokens))
    // a token appearing in two different replicas would make dedup candidates
    // quadratic — there must be none
    val crossReplica = toks.groupBy("tok")
      .agg(countDistinct(col("r")).as("nr")).filter(col("nr") > 1).count()
    assert(crossReplica === 0)
    // duplicate structure preserved within each replica: docs 1 and 3 are exact
    // duplicates in the base, so each replica contains exactly one dup pair
    val dupGroups = out.groupBy(col("text")).count().filter(col("count") === 2)
    assert(dupGroups.count() === 3)
  }

  private lazy val eventsDir: String = {
    val dir = tempDir().toString
    import spark.implicits._
    Seq(
      (1L, "2024-03-01 10:01:30", 100L, "click", 12.5, "{}"),
      (2L, "2024-03-01 10:07:45", 100L, "view", 3.0, "{}"),
      (3L, "2024-03-01 10:12:10", 101L, "click", 44.0, "{}"),
      (4L, "2024-03-01 11:55:00", 101L, "view", 7.25, "{}"),
      (5L, "2024-03-01 13:20:05", 102L, "click", 99.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("scaleEvents: ×N rows, unique ids, replica 0 verbatim, gapped disjoint time ranges") {
    val out = ScaleData.scaleEvents(spark, eventsDir, 3).cache()
    assert(out.count() === 15)
    assert(out.select("event_id").distinct().count() === 15)
    assert(out.select("user_id").distinct().count() === 9) // 3 users × 3 replicas
    val base = spark.read.parquet(s"$eventsDir/events.parquet")
      .select("event_id", "ts", "value").collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getDouble(2)))).toMap
    out.filter(col("event_id") < ScaleData.IdStride).collect().foreach { r =>
      assert((r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value"))
        === base(r.getAs[Long]("event_id")))
    }
    // replica time ranges must be disjoint with a gap wider than the 30-min
    // session-window gap, so sessions can never merge across replicas
    val ranges = out.select(
        (col("event_id") / ScaleData.IdStride).cast("int").as("r"),
        unix_millis(col("ts")).as("ms"))
      .groupBy("r").agg(min(col("ms")).as("lo"), max(col("ms")).as("hi"))
      .orderBy("r").collect()
    ranges.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("lo") - a.getAs[Long]("hi") > 30L * 60 * 1000,
        s"replica gap too small: $a -> $b")
    }
  }

  test("scaleEvents: epoch-aligned 10-min window structure is an isomorphic image per replica") {
    val out = ScaleData.scaleEvents(spark, eventsDir, 3)
    // Per replica, the histogram over 10-min buckets RELATIVE to the replica's
    // first bucket must equal the base corpus's histogram — this is exactly the
    // "shift is a whole multiple of every window size" alignment claim.
    def hist(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val b = df.select((unix_millis(col("ts")) / 600000L).cast("long").as("bucket"))
      val lo = b.agg(min("bucket")).head().getLong(0)
      b.groupBy((col("bucket") - lo).as("rel")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val baseHist = hist(spark.read.parquet(s"$eventsDir/events.parquet"))
    (0 until 3).foreach { r =>
      val rep = out.filter(
        col("event_id") >= r * ScaleData.IdStride &&
        col("event_id") < (r + 1) * ScaleData.IdStride)
      assert(hist(rep) === baseHist, s"replica $r window histogram diverged")
    }
    // value/type payloads untouched: per-replica value sums equal the base sum
    val baseSum = spark.read.parquet(s"$eventsDir/events.parquet")
      .agg(sum("value")).head().getDouble(0)
    val perReplica = out.groupBy((col("event_id") / ScaleData.IdStride).cast("int").as("r"))
      .agg(sum("value").as("s")).collect().map(_.getAs[Double]("s"))
    assert(perReplica.length === 3 && perReplica.forall(_ === baseSum))
  }

  private lazy val sparseSrcDir: String = {
    // ids chosen so the kept set (doc_id % 20 == 0) contains a planted exact
    // dup pair (20, 40) — mirroring the real corpus, whose near-dup id deltas
    // are ≡ 0 (mod 20)
    val dir = tempDir().toString
    import spark.implicits._
    Seq(
      (20L, "the quick brown fox jumps high", "en", "web"),
      (40L, "the quick brown fox jumps high", "en", "web"),
      (21L, "pack my box with five dozen jugs", "en", "web"),
      (22L, "sphinx of black quartz judge my vow", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("scaleDocumentsSparse: kept docs preserve within-replica dup structure; all others are token-isolated") {
    val n = 3
    val out = ScaleData.scaleDocumentsSparse(spark, sparseSrcDir, n).cache()
    assert(out.count() === 4 * n)
    assert(out.select("doc_id").distinct().count() === 4 * n)
    val toks = out.select(col("doc_id"),
      explode(split(col("text"), "\\s+")).as("tok"))
    // Non-kept docs (21, 22 in every replica) share no token with ANY other
    // doc — each of their tokens appears in exactly one doc.
    val nonKeptShared = toks.withColumn("base", pmod(col("doc_id"), lit(ScaleData.IdStride)))
      .withColumn("is_kept", pmod(col("base"), lit(20)) === 0)
      .groupBy("tok")
      .agg(countDistinct(col("doc_id")).as("nd"), max(col("is_kept")).as("any_kept"))
      .filter(!col("any_kept") && col("nd") > 1)
    assert(nonKeptShared.count() === 0, "a non-kept doc shares a token")
    // Kept docs: the planted dup pair (20, 40) survives in every replica —
    // exactly n groups of 2 identical texts.
    assert(out.groupBy(col("text")).count().filter(col("count") === 2).count() === n)
    // and kept docs never share tokens ACROSS replicas (pairs scale ×N not ×N²)
    val crossReplica = toks
      .withColumn("r", (col("doc_id") / ScaleData.IdStride).cast("int"))
      .groupBy("tok").agg(countDistinct(col("r")).as("nr")).filter(col("nr") > 1)
    assert(crossReplica.count() === 0)
    // candidate-doc coverage on this fixture = the kept half; on the real
    // corpus keepEvery=20 puts it at ~5%, under the 25% verify-prune gate
    val keptDocs = out.filter(pmod(pmod(col("doc_id"), lit(ScaleData.IdStride)), lit(20)) === 0)
    assert(keptDocs.count() === 2 * n)
  }

  test("scaleDocumentsZipf: one hot source holds ~1/hotMod of docs; id residues skewed the same way; ids unique") {
    val n = 250 // 4 docs × 250 replicas = 1000 (doc, replica) draws
    val out = ScaleData.scaleDocumentsZipf(spark, srcDir, n).cache()
    assert(out.count() === 4 * n)
    assert(out.select("doc_id").distinct().count() === 4 * n)
    val hotN = out.filter(col("source") === "srchot").count()
    // hash-chosen at 1/5: loose band, deterministic draw
    assert(hotN > (4 * n) * 0.12 && hotN < (4 * n) * 0.28, s"hot share off: $hotN")
    // the hot source and the hot id-residue class are the SAME docs
    assert(out.filter(col("source") === "srchot" &&
      pmod(col("doc_id"), lit(20)) =!= 0).count() === 0)
    assert(out.filter(col("source") =!= "srchot" &&
      pmod(col("doc_id"), lit(20)) === 0).count() === 0)
    // cold residues stay in 1..19
    val residues = out.filter(col("source") =!= "srchot")
      .select(pmod(col("doc_id"), lit(20)).as("m"))
      .agg(min("m"), max("m")).head()
    assert(residues.getLong(0) >= 1 && residues.getLong(1) <= 19)
  }

  test("scaleEventsDense: same time axis, per-bucket density ×N, ids unique") {
    val n = 3
    val out = ScaleData.scaleEventsDense(spark, eventsDir, n).cache()
    val base = spark.read.parquet(s"$eventsDir/events.parquet")
    assert(out.count() === base.count() * n)
    assert(out.select("event_id").distinct().count() === base.count() * n)
    assert(out.select("user_id").distinct().count() === 3 * n)
    // time range IDENTICAL to the base (no shift): every window bucket holds
    // exactly N× the base rows
    val baseHist = base.select((unix_millis(col("ts")) / 600000L).cast("long").as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val outHist = out.select((unix_millis(col("ts")) / 600000L).cast("long").as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(outHist === baseHist.map { case (k, v) => k -> v * n })
  }

  test("scaleEmbeddings: ×N rows, unique ids, replica 0 verbatim") {
    val out = ScaleData.scaleEmbeddings(spark, srcDir, 4).cache()
    assert(out.count() === 12)
    assert(out.select("vec_id").distinct().count() === 12)
    val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    out.filter(col("vec_id") < ScaleData.IdStride).collect().foreach { r =>
      assert(r.getAs[Seq[Float]]("embedding") === base(r.getAs[Long]("vec_id")))
    }
  }

  test("scaleEmbeddings: within-replica dot products are EXACTLY preserved (isometry)") {
    val out = ScaleData.scaleEmbeddings(spark, srcDir, 4)
    val withR = out.select(
      (col("vec_id") / ScaleData.IdStride).cast("int").as("r"),
      pmod(col("vec_id"), lit(ScaleData.IdStride)).as("base_id"),
      col("embedding"))
    val pairs = withR.as("a").join(withR.as("b"),
        col("a.r") === col("b.r") && col("a.base_id") < col("b.base_id"))
      .select(col("a.r").as("r"), col("a.base_id").as("ia"), col("b.base_id").as("ib"),
        aggregate(zip_with(col("a.embedding"), col("b.embedding"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("dot"))
      .collect()
    // group by (ia, ib): every replica's dot must equal replica 0's bit-for-bit
    val byPair = pairs.groupBy(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")))
    byPair.foreach { case (_, rows) =>
      val dots = rows.map(_.getAs[Double]("dot")).distinct
      assert(dots.size === 1, s"dot product not invariant across replicas: $rows")
    }
    assert(byPair.size === 3) // 3 base pairs
  }
}
