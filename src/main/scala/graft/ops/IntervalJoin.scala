package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — the natural genomic extension the reference
  * never needed (it only joins BED intervals by NAME, SURVEY §2.3 J3/J8): pairs
  * of closed intervals `[start, end]` sharing equal keys whose ranges intersect.
  *
  * Scale shape: a naive formulation is an equi-join on the keys plus range
  * predicates — Spark plans that as a per-key cross join (BroadcastNestedLoop /
  * cartesian within key groups), quadratic in key frequency. Here every interval
  * is instead exploded to the fixed-size BINS it touches and candidates equi-join
  * on (keys, bin) — the same bucketing a genome-arithmetic engine uses for
  * chromosome coordinates. A pair is emitted ONLY from the bin containing
  * `max(start_a, start_b)` (that bin provably intersects both intervals), so
  * each overlapping pair appears exactly once with NO distinct() shuffle, and
  * cross-bin duplicates never materialize.
  *
  * Cost: rows explode by ceil(len/binSize)+1 per interval — size `binSize` near
  * the typical interval length so most intervals touch 1-2 bins; skewed keys
  * split across bins instead of forming one quadratic block. Coordinates must be
  * non-negative (genome positions, epoch seconds): bins use integral `div`,
  * which truncates toward zero.
  */
object IntervalJoin {

  /** Overlapping pairs of `a` × `b` on equal `keys` and intersecting
    * [startCol, endCol] (closed; rows with end < start are dropped — a negative
    * span has no overlap semantics and would corrupt bin enumeration).
    * Output: keys, id_a, start_a, end_a, id_b, start_b, end_b.
    * With `selfJoin = true` pass the same frame twice; `id_a < id_b` dedupes. */
  def overlapPairs(a: DataFrame, b: DataFrame, keys: Seq[String], idCol: String,
                   startCol: String, endCol: String, binSize: Long,
                   selfJoin: Boolean = false): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    def binned(df: DataFrame, s: String): DataFrame =
      df.filter(col(endCol) >= col(startCol))
        .select(keys.map(col) ++ Seq(
          col(idCol).as(s"id_$s"),
          col(startCol).cast("long").as(s"start_$s"),
          col(endCol).cast("long").as(s"end_$s")): _*)
        .select(col("*"),
          explode(sequence(expr(s"start_$s div ${binSize}L"),
            expr(s"end_$s div ${binSize}L"), lit(1L))).as("bin"))
    val l = binned(a, "a")
    val r = binned(b, "b")
    val overlap = col("start_a") <= col("end_b") && col("start_b") <= col("end_a")
    // The unique emission bin: max(start_a, start_b) lies inside BOTH intervals
    // whenever they overlap, so exactly one shared bin passes this predicate.
    val emitOnce = col("bin") === expr(s"greatest(start_a, start_b) div ${binSize}L")
    val pairPred = if (selfJoin) col("id_a") < col("id_b") else lit(true)
    l.join(r, keys :+ "bin")
      .filter(pairPred && overlap && emitOnce)
      .select((keys.map(col) :+ col("id_a") :+ col("start_a") :+ col("end_a") :+
        col("id_b") :+ col("start_b") :+ col("end_b")): _*)
  }
}
