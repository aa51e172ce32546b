package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scan-parallelism repair for heavy per-row operators.
  *
  * A small corpus lands in single-row-group parquet files, and a row group
  * is unsplittable — the scan plans as ONE task no matter how many cores the
  * session has, so compute-heavy per-row work (tokenization, Viterbi,
  * media decode, n-gram explodes) serializes on one core while the rest of
  * the machine idles. That is the "huge unsplittable input file" case of the
  * skew playbook, and the fix is the playbook's: repartition immediately
  * after the read.
  *
  * [[widen]] does that ADAPTIVELY: it adds a round-robin repartition to the
  * session's default parallelism only when the frame is an exchange-free
  * (scan-shaped) plan with fewer partitions than that. At production scale a
  * corpus scan already has thousands of input splits, so widen is the
  * identity — it never adds a corpus-wide shuffle where parallelism already
  * exists. The rows it does move at small scale are the narrow projections
  * the callers hand it (ids + text / ids only), bytes that are trivially
  * cheaper than the per-row compute they unlock.
  *
  * Results are partitioning-independent for every caller by contract:
  * integer-count aggregations, per-row projections, equi-joins, min/max.
  * Callers with order-sensitive floating-point aggregations must NOT widen.
  */
object Spread {

  /** `df` repartitioned to the session's default parallelism iff it is an
    * exchange-free plan with fewer partitions than that; identity otherwise.
    *
    * The exchange check is load-bearing: probing partition counts through an
    * ADAPTIVE plan would eagerly materialize its shuffle stages (AQE executes
    * query stages to re-plan), running upstream work once at probe time and
    * again at query time. A plan that already contains an exchange gets its
    * parallelism from that exchange's partitioning, so identity is also the
    * right answer there. For exchange-free plans (scans, projections,
    * checkpoints, local relations) the partition probe builds the RDD without
    * running any job. */
  def widen(df: DataFrame): DataFrame = {
    // streaming frames cannot be probed (or batch-repartitioned) — the
    // micro-batch engine already owns their partitioning; the shared
    // operators' streaming twins pass through unchanged
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.executedPlan match {
      case _: AdaptiveSparkPlanExec => df
      case plan =>
        if (plan.execute().getNumPartitions >= p) df else df.repartition(p)
    }
  }
}
