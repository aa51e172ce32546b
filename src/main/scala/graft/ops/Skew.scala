package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting (on by default) handles most cases at runtime; these
  * are the explicit shapes for the two places AQE can't help:
  *   - [[saltedAggregate]] — a hot GROUP BY key (one chromosome, one project)
  *     overwhelms a single reducer: two-phase aggregation over a salted key fans
  *     the hot key across `buckets` reducers, then combines partials. Caller
  *     supplies per-phase aggregate expressions (partial → final), e.g.
  *     `count` → `sum`, `sum` → `sum`.
  *   - [[saltedBroadcastLeft]] — skewed join against a non-broadcastable side:
  *     salt the big (probe) side, explode the build side across all salt values,
  *     join on (key, salt). Shuffle-free for the replicated side.
  *
  * Salt = deterministic hash of the whole row spread over `buckets` — stable
  * across retries (no rand(): nondeterminism breaks task re-execution).
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets). */
  def salt(buckets: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted aggregation.
    *
    * @param partial aggregate expressions for phase 1 (per (keys, salt) group)
    * @param finalAgg aggregate expressions for phase 2 (recombining partials);
    *                 must consume the aliased outputs of `partial`
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      saltCols: Seq[Column],
                      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val phase1 = df
      .withColumn("_salt", salt(buckets, saltCols))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted join for a skewed probe side against a small-ish (but not
    * broadcast-small) build side: probe rows get a deterministic salt, build rows
    * are replicated across every salt value, the join key becomes (key, salt) —
    * hot keys spread over `buckets` reducers. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val p = probe.withColumn("_salt", salt(buckets, probe.columns.map(col).toSeq))
    val b = build
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Cap pathological LSH/blocking buckets: drop candidate-generation buckets with
    * more than `maxBucket` members (they are near-useless for dedup — a bucket
    * holding 10% of the corpus means the band is not discriminative — and their
    * pair-count is quadratic). Returns the frame filtered to surviving buckets.
    * `bucketCols` identify the bucket. The reference corpus's word-salad documents
    * make this concrete: 8-bit SimHash blocks put thousands of docs in one bucket.
    * Callers who cannot afford to lose the dropped rows should re-block them under
    * a finer key instead — see
    * [[graft.operators.SimilaritySearch.embeddingNearDupPairs]], which routes
    * over-cap blocks through a (block, sign-LSH) sub-bucketing. */
  def capBuckets(df: DataFrame, bucketCols: Seq[String], maxBucket: Long): DataFrame = {
    val counts = df.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("_bucket_n"))
      .filter(col("_bucket_n") <= maxBucket)
      .drop("_bucket_n")
    df.join(counts, bucketCols)  // small (bucket-key) side; Spark broadcasts when it fits
  }
}
