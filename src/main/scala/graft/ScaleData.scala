package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the `documents` / `embeddings` tables, for the
  * data-bound scaling bench ([[ScalingBench]]).
  *
  * The replication is structure-preserving, which is what makes the scaling
  * series honest:
  *
  *   - '''documents''': replica `r` suffixes every whitespace token with
  *     `~<base26(r)>`. Within a replica the corpus is an exact isomorphic image
  *     of the original (same token counts, same duplicate/near-duplicate
  *     structure, same shingle-set relationships), while across replicas no
  *     token — hence no shingle, no MinHash band, no gram — collides. Dedup
  *     candidate pairs therefore scale exactly ×N (linear), never ×N² (the
  *     degenerate shape naive row duplication would produce). The suffix is
  *     chosen to keep the curation gates live: `~` is a regex non-word char, so
  *     `\bthe\b`-style stopword hits (langIdEn) still fire, and the base-26
  *     digits are alphabetic, so the qualityScore alpha-density term moves only
  *     marginally. `source`/`lang` columns are untouched (q75/q76-style
  *     stratification and split predicates see the same distribution).
  *   - '''embeddings''': replica `r` applies a cyclic dimension shift by
  *     `r mod dims` plus a deterministic per-(replica, dim) sign flip. Both are
  *     isometries of the dot product: for same-replica vectors
  *     `(s⊙rot(a))·(s⊙rot(b)) = Σ s_i² a_i b_i  = a·b` exactly, so
  *     within-replica cosine structure (near-dup pairs, kNN ranks, cluster
  *     geometry) is bit-preserved; across replicas the signs decorrelate, so
  *     similarity pairs again scale ×N.
  *
  * Ids get a disjoint per-replica stride so every downstream id-keyed operator
  * (dedup canonicals, cluster labels, splits) sees globally unique keys.
  *
  * Usage: `ScaleData <srcDir> <outDir> <replicas>` — writes
  * `outDir/documents.parquet` and `outDir/embeddings.parquet`.
  */
object ScaleData {

  val IdStride = 10000000L

  /** Base-26 alphabetic encoding of a non-negative int ("0"→"a", "25"→"z",
    * "26"→"ba") — expressed as a Column so the whole mutation stays in-scan. */
  private def alpha26(n: Column): Column =
    translate(n.cast("string"), "0123456789", "abcdefghij")

  /** Replica-expanded documents: one output row per (input row, r in 0..n-1). */
  def scaleDocuments(spark: SparkSession, srcDir: String, n: Int) = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val tagged = docs
      .withColumn("r", explode(sequence(lit(0), lit(n - 1))))
    val mutated = array_join(
      transform(split(col("text"), "\\s+"),
        t => concat(t, lit("~"), alpha26(col("r")))), " ")
    tagged
      .withColumn("text",
        when(col("r") === 0, col("text")).otherwise(mutated))
      .withColumn("doc_id", col("doc_id") + col("r") * IdStride)
      .withColumn("n_chars", length(col("text")))
      .drop("r")
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Replica-expanded events: replica `r` shifts the time axis by
    * `r * shift`, where `shift` is the corpus span rounded UP to a whole hour
    * plus a 2-hour margin. Because every event-time bucketing the engine uses
    * (10-minute top-k windows, 1-hour tumbling windows) is epoch-aligned and
    * divides one hour, an hour-multiple shift preserves each event's position
    * within its bucket EXACTLY — each replica is an isomorphic image of the
    * base corpus on a disjoint time range (window count ×N, per-window
    * density unchanged — the honest shape for "the stream ran N× longer").
    * Session windows are gap-based, hence shift-invariant; the ≥2 h margin
    * (any margin > the 30-min session gap) plus per-replica user/event id
    * strides keep sessions and keys from bleeding across replicas. `value`,
    * `event_type`, `props` are untouched, so value-binned aggregations (q22)
    * see ×N rows into the same bins. */
  def scaleEvents(spark: SparkSession, srcDir: String, n: Int) = {
    val ev = graft.queries.RelationalQueries.events(spark, srcDir)
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val hourMicros = 3600L * 1000000L
    val shift = ((mm.getLong(1) - mm.getLong(0)) / hourMicros + 3) * hourMicros
    ev.withColumn("r", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("ts", timestamp_micros(unix_micros(col("ts")) + col("r") * shift))
      .withColumn("event_id", col("event_id") + col("r") * IdStride)
      .withColumn("user_id", col("user_id") + col("r") * IdStride)
      .drop("r")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Replica-expanded embeddings: shift-and-sign-flip isometry per replica. */
  def scaleEmbeddings(spark: SparkSession, srcDir: String, n: Int) = {
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val tagged = emb.withColumn("r", explode(sequence(lit(0), lit(n - 1))))
    val dims = size(col("embedding"))
    val rotatedFlipped = transform(sequence(lit(0), dims - 1), i =>
      (element_at(col("embedding"), pmod(i + col("r"), dims).cast("int") + 1) *
        when(col("r") === 0, lit(1.0f))
          .otherwise(when(pmod(xxhash64(col("r"), i), lit(2)) === 0, lit(1.0f))
            .otherwise(lit(-1.0f)))).cast("float"))
    tagged
      .withColumn("embedding", rotatedFlipped)
      .withColumn("vec_id", col("vec_id") + col("r") * IdStride)
      .drop("r")
      .select("vec_id", "embedding", "label")
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleData <srcDir> <outDir> <replicas> [tables]  (tables: comma list of documents,embeddings,events; default all)")
    val Array(srcDir, outDir, nStr) = args.take(3)
    val n = nStr.toInt
    require(n >= 1, s"replicas must be >= 1: $n")
    val tables = args.lift(3).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("documents", "embeddings", "events"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = math.min(32, math.max(4, n / 2))
    val counts = Seq(
      "documents" -> (() => scaleDocuments(spark, srcDir, n)),
      "embeddings" -> (() => scaleEmbeddings(spark, srcDir, n)),
      "events" -> (() => scaleEvents(spark, srcDir, n)))
      .filter { case (name, _) => tables(name) }
      .map { case (name, gen) =>
        gen().repartition(parts).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        name -> spark.read.parquet(s"$outDir/$name.parquet").count()
      }
    val countsJson = counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"out":"$outDir","replicas":$n,$countsJson}""")
    spark.stop()
  }
}
