package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-parallelism repair for heavy per-row operators.
  *
  * A corpus can land in one huge unsplittable input (a single row group, a
  * gzip member): the scan plans as ONE task no matter how many cores the
  * session has, so compute-heavy per-row work (tokenization, Viterbi,
  * media decode, n-gram explodes) serializes on one core while the rest of
  * the machine idles. That is the "huge unsplittable input file" case of the
  * skew playbook, and the fix is the playbook's: repartition immediately
  * after the read.
  *
  * The repartition is a real shuffle of whatever the caller projects, so it
  * must only fire when the moved bytes are small against the compute they
  * unlock. Two entry points encode that decision:
  *
  *   - [[widen]] — BYTE-GATED: repartitions an exchange-free (scan-shaped)
  *     plan to `min(defaultParallelism, ceil(estimatedBytes / targetBytes))`
  *     partitions, identity when the input already has at least that many.
  *     A small input (estimate under one target-sized partition) is left
  *     alone: shuffling it costs more than the single-core serialization it
  *     would remove — measured at bench scale, where a blanket widen made
  *     text/vector-payload paths 1.5–2.5x slower. A genuinely under-split
  *     large input (one 10 GB gzip) still fans out to size-appropriate
  *     parallelism. `targetBytes` is `spark.graft.widen.targetPartitionBytes`
  *     (default 128 MiB, the input-split convention) so production can tune
  *     it without code changes.
  *   - [[widenForCompute]] — UNCONDITIONAL (up to defaultParallelism): for
  *     call sites whose per-row compute is declared heavy by the caller and
  *     whose projected row is narrow (ids/codes, a few bytes). There the
  *     moved bytes are trivial at any scale and the compute dominates even
  *     for small inputs (media codec synthesis per id).
  *
  * At production scale a corpus scan already has thousands of input splits,
  * so BOTH forms are the identity — neither ever adds a corpus-wide shuffle
  * where parallelism already exists.
  *
  * Results are partitioning-independent for every caller by contract:
  * integer-count aggregations, per-row projections, equi-joins, min/max.
  * Callers with order-sensitive floating-point aggregations must NOT widen.
  */
object Spread {

  /** Production knob: bytes each repartitioned slice should carry. */
  val TargetBytesKey = "spark.graft.widen.targetPartitionBytes"
  private val DefaultTargetBytes = 128L * 1024 * 1024

  /** `df` repartitioned to `min(defaultParallelism, ceil(bytes/targetBytes))`
    * iff it is an exchange-free plan with fewer partitions than that;
    * identity otherwise (and always for streaming frames and inputs small
    * enough that one target-sized partition holds them). */
  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    val tb = df.sparkSession.conf
      .get(TargetBytesKey, DefaultTargetBytes.toString).toLong
    require(tb > 0L, s"$TargetBytesKey must be positive: $tb")
    // Size estimate of the projection the caller hands in — file bytes for
    // scans, width-scaled for projections. The gate only needs the order of
    // magnitude: under one target partition => leave it alone. Read off the
    // ANALYZED plan (Datasets analyze eagerly, so this runs only the cheap
    // stats visitor) rather than `optimizedPlan`, which would run the full
    // optimizer once per widen call purely for the estimate.
    val est = df.queryExecution.analyzed.stats.sizeInBytes
    val byBytes = (est + tb - 1) / tb
    val target = byBytes.min(BigInt(p)).max(BigInt(1)).toInt
    widenTo(df, target)
  }

  /** The caller declares the per-row compute heavy and the projected row
    * narrow: repartition an exchange-free plan straight to the session's
    * default parallelism (identity when splits already reach it). */
  def widenForCompute(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    widenTo(df, df.sparkSession.sparkContext.defaultParallelism)
  }

  /** The exchange check is load-bearing: probing partition counts through an
    * ADAPTIVE plan would eagerly materialize its shuffle stages (AQE executes
    * query stages to re-plan), running upstream work once at probe time and
    * again at query time. A plan that already contains an exchange gets its
    * parallelism from that exchange's partitioning, so identity is also the
    * right answer there. For exchange-free plans (scans, projections,
    * checkpoints, local relations) the partition probe builds the RDD without
    * running any job. */
  private def widenTo(df: DataFrame, target: Int): DataFrame = {
    if (target <= 1) return df
    df.queryExecution.executedPlan match {
      case _: AdaptiveSparkPlanExec => df
      case plan =>
        if (plan.execute().getNumPartitions >= target) df
        else df.repartition(target)
    }
  }
}
