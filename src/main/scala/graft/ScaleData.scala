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
    require(args.length == 3, "usage: ScaleData <srcDir> <outDir> <replicas>")
    val Array(srcDir, outDir, nStr) = args
    val n = nStr.toInt
    require(n >= 1, s"replicas must be >= 1: $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parts = math.min(32, math.max(4, n / 2))
    scaleDocuments(spark, srcDir, n).repartition(parts)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(spark, srcDir, n).repartition(parts)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"""{"out":"$outDir","replicas":$n,"documents":$nd,"embeddings":$ne}""")
    spark.stop()
  }
}
