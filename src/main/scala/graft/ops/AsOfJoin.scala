package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — with [[IntervalJoin]], the second classic operator the
  * reference's name-equality joins never needed: for every left row, attach the
  * single right row with the greatest `rightTime <= leftTime` among equal keys
  * (market-data "last quote before trade", genomics "nearest upstream feature").
  *
  * Scale shape: the naive formulation (equi-join on keys + inequality + per-pair
  * max) is a per-key cross join followed by a re-aggregation. Here both sides
  * are UNIONED and sorted once per key — a running `last(payload, ignoreNulls)`
  * window carries the most recent right payload forward into each left row.
  * ONE shuffle on the keys, linear scan per partition, no quadratic pair set,
  * and no join at all in the physical plan.
  *
  * Ordering: rows sort by (time, side) with right rows first at equal times, so
  * a right row AT the left row's timestamp is visible to it (inclusive <=).
  * Ties between right rows at the same (keys, time) resolve to the greatest
  * payload struct (rare in practice — document or pre-dedupe for uniqueness).
  */
object AsOfJoin {

  /** Left rows enriched with the as-of right payload.
    * Output: all left columns + `payloadCols` (from the right side, renamed with
    * `payloadPrefix`), null when no right row precedes — filter on
    * `<prefix><first payload col> IS NOT NULL` for inner semantics. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, payloadCols: Seq[String],
           payloadPrefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must name at least one right column")
    val l2 = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_side", lit(1))
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("_t"),
        lit(0).as("_side"),
        struct(payloadCols.map(col): _*).as("_payload")): _*)
    val unioned = r2.unionByName(l2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val payloadOut = payloadCols.map(c =>
      col(s"_asof.$c").as(s"$payloadPrefix$c"))
    carried.select(left.columns.toIndexedSeq.map(col) ++ payloadOut: _*)
  }
}
