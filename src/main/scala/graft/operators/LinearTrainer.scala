package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed TRAINING of a linear text classifier — the trainable half of
  * the fastText-style quality filtering the pipeline already serves at
  * inference time ([[TextFunctions.hashedFeatureScore]], q91): CCNet-grade
  * pipelines train a cheap linear model on "good vs crawl" labels and filter
  * the crawl with it (Joulin et al. 2016 fastText; Wenzek et al. 2020).
  *
  * The learner is the BATCH PERCEPTRON in exact integer arithmetic: hashed
  * token-COUNT features (non-negative longs), labels ±1, and per iteration
  *   w ← w + Σ_{docs with y·⟨w,x⟩ ≤ 0} y·x
  * (zero margin counts as misclassified, so iteration 1 from w=0 updates on
  * every doc — deterministic, and the whole trajectory is replayable in SQL,
  * which is what lets the DuckDB oracle re-train the identical model).
  * Gradient-descent logistic regression would need exp(); libm differs
  * across engines, so the perceptron is the oracle-exact choice — same
  * decision family (linear), standard mistake-bound convergence.
  *
  * Scale shape: the weight vector (dims longs) lives driver-side and ships
  * into each iteration as a LITERAL array in HOF-argument position; one
  * iteration = one corpus pass whose shuffle is the posexplode of
  * MISCLASSIFIED rows' features reduced map-side to a dims-sized gradient
  * (never rows to the driver — `dims` rows per iteration). T iterations scan
  * the feature frame T times: localCheckpoint/cache it at the call site when
  * iterating deeply.
  */
object LinearTrainer {

  /** Per-token hash buckets (md5Bits32 % dims) — stage THIS as a column
    * before [[countsFromBuckets]]: the md5 runs once per token here; inlining
    * it into the per-dimension count lambda would re-hash the whole doc per
    * dimension (the SCALE.md lambda-body corollary). */
  def tokenBuckets(toks: Column, dims: Int): Column = {
    require(dims >= 1, s"dims must be positive: $dims")
    transform(toks, tk => TextFunctions.hashBucket(tk, dims))
  }

  /** Dense integer count vector (length `dims`) from an ALREADY-BOUND bucket
    * array: counts[d] = occurrences of bucket d. Pass an attribute
    * reference. O(T·dims) cheap comparisons per row, zero shuffle.
    *
    * The `when(size(buckets) >= 0, …)` guard is STRUCTURAL, not defensive:
    * it makes this expression reference `buckets` twice, so CollapseProject
    * keeps the caller's staged bucket column as a per-row projection instead
    * of inlining the md5 hashing into the per-dimension filter lambda (the
    * SCALE.md lambda-body corollary — measured 26 s → 2 s on q157's
    * 3-iteration training at sf0.1). */
  def countsFromBuckets(buckets: Column, dims: Int): Column = {
    require(dims >= 1, s"dims must be positive: $dims")
    when(size(buckets) >= 0,
      transform(sequence(lit(0), lit(dims - 1)),
        d => size(filter(buckets, b => b === d)).cast("long")))
      .otherwise(typedLit(Seq.empty[Long]))
  }

  /** ⟨w, x⟩ for a literal weight vector — weights ride `typedlit` in
    * ARGUMENT position (evaluated once per row). Exact long arithmetic. */
  def dotWithWeights(features: Column, weights: Seq[Long]): Column =
    aggregate(zip_with(features, typedlit(weights), (x, w) => x * w),
      lit(0L), (acc, v) => acc + v)

  /** Train `iters` batch-perceptron iterations over (featuresCol:
    * array<long> of length dims, labelCol: ±1 long). Returns the final
    * weights. Exact integers end to end; deterministic (no row order
    * dependence — the batch update is a sum). */
  def perceptronTrain(feat: DataFrame, featuresCol: String, labelCol: String,
                      dims: Int, iters: Int): Array[Long] = {
    require(dims >= 1 && iters >= 1, s"need dims >= 1 and iters >= 1, got $dims/$iters")
    // materialize the features ONCE: training is inherently multi-pass, and
    // without the lineage cut PushDownPredicate splices the whole feature
    // expression into each iteration's margin Filter — where the
    // CollapseProject alias-cost guard does not apply, so the per-token
    // hashing re-runs per DIMENSION inside the count lambda (measured 22 s →
    // 1.6 s for 3 iterations at sf0.1, `tools/PercProf`)
    val staged = feat.select(col(featuresCol), col(labelCol)).localCheckpoint()
    val w = Array.fill(dims)(0L)
    for (_ <- 1 to iters) {
      val margin = dotWithWeights(col(featuresCol), w.toSeq) * col(labelCol)
      val grad = staged.filter(margin <= 0)
        .select(col(labelCol).as("_y"), posexplode(col(featuresCol)).as(Seq("_pos", "_x")))
        .groupBy(col("_pos")).agg(sum(col("_x") * col("_y")).as("_g"))
        .collect() // dims rows, bounded by construction
      grad.foreach(r => w(r.getInt(0)) += r.getLong(1))
    }
    w
  }

  /** Classification column for a trained model: +1/−1 by sign of ⟨w, x⟩
    * (zero scores −1, matching the training margin convention). */
  def predict(features: Column, weights: Seq[Long]): Column =
    when(dotWithWeights(features, weights) > 0, 1L).otherwise(-1L)
}
