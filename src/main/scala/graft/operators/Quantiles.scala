package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles at corpus scale — the length/score distribution
  * gate every curation pipeline needs ("trim above p99", "report p50/p90
  * tokens per source") computed EXACTLY, not by sketch.
  *
  * Scale shape: the naive exact plan sorts every row per group (a full
  * shuffle + sort of the corpus). This one never moves rows: it aggregates to
  * a (group, value) HISTOGRAM first — map-side combined, so the shuffle
  * carries at most |distinct values| rows per group — then takes a running
  * sum over the sorted distinct values and reads each quantile as the
  * smallest value whose cumulative count reaches ceil(q·n) (type-1 /
  * discrete quantile: always an observed value, integer-exact across
  * engines). Token-count and score columns have value domains orders of
  * magnitude smaller than row counts, which is what makes this exact path
  * viable at 100 TB; for adversarially dense double columns, fall back to
  * approx_percentile and keep this as the verification pass.
  *
  * Same cumsum-over-distinct-values backbone as
  * [[Sampling.trimByValueQuantile]], generalized to report arbitrary
  * quantile vectors per group.
  */
object Quantiles {

  /** Per-group exact type-1 quantiles of `valueCol` (long-valued): one row per
    * group — (group, n, p&lt;q1&gt;, p&lt;q2&gt;, ...). Each q in (0, 1]. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0.0 && q <= 1.0), s"quantiles must be in (0,1]: $qs")
    require(qs.distinct == qs, s"duplicate quantiles: $qs")
    val hist = df.groupBy(col(groupCol), col(valueCol).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val cum = hist.select(col(groupCol), col("_v"),
      sum(col("_c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("_v"))).as("_cum"),
      sum(col("_c")).over(Window.partitionBy(col(groupCol))).as("_n"))
    val qCols = qs.map { q =>
      min(when(col("_cum") >= ceil(lit(q) * col("_n")), col("_v"))).as(pName(q))
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"), qCols: _*)
  }

  /** Column name for quantile q: p50, p99, p99_9 ... */
  private[operators] def pName(q: Double): String = {
    val pct = q * 100.0
    if (pct == pct.floor) s"p${pct.toLong}"
    else "p" + BigDecimal(pct).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_")
  }
}
