package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for pipeline-input sanity gates: per-column non-null count,
  * exact distinct count, and min/max — the relational core of what the
  * reference does ad hoc with `cut | sort | uniq | wc -l` sweeps over its
  * AccLists and reports (`sample_counting.sh`, `run_RNApipeline…:258-265`), and
  * what any 100 TB ingest runs before training: null-rate checks, key
  * cardinality, range sanity.
  *
  * Shape: ONE aggregate job computes 4 expressions per profiled column (Spark
  * expands multi-distinct into an Expand + single shuffle), then the 1×4k row
  * is unpivoted with `stack` — still a DataFrame, no driver loop over data.
  */
object Profiler {

  /** Profile `cols` (default: every column) of `df`. Output rows:
    * (col_name, n_non_null, n_distinct, min_str, max_str), one per column;
    * min/max are rendered as strings so heterogeneous column types coexist. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "nothing to profile")
    require(targets.forall(df.columns.contains),
      s"unknown columns: ${targets.filterNot(df.columns.contains).mkString(", ")}")
    val aggs = targets.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        count_distinct(col(c)).as(s"${c}__d"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr =
      s"stack(${targets.size}, " +
        targets.map(c => s"'$c', `${c}__n`, `${c}__d`, `${c}__min`, `${c}__max`")
          .mkString(", ") +
        ") as (col_name, n_non_null, n_distinct, min_str, max_str)"
    wide.selectExpr(stackExpr)
  }
}
