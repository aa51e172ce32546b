package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-project merge (the `utilities/` combine workflow): report unions, matrix
  * joins, duplicate-sample detection.
  *
  * Re-expresses `utilities/…/combine_multStrategy_Directories.bash`:
  *   - O7 (`:135-191`) — union of two runs' sex/conflict tables; the reference's
  *     header-once handling is a text-format artifact, `unionByName` is the relational
  *     equivalent (CRLF/blank cleanup `:112-116` happens in the readers),
  *   - J2 (`:238-256` + 3 more) — INNER equi-join of two wide matrices on feature id
  *     (GNU `join -t'\t' -1 1 -2 1` over `sort -k1,1` = sort-merge join); rows
  *     missing from either side are silently dropped, the reference only *warns*
  *     when output < input (`:247-256`) — preserved via [[MergeStats]],
  *   - J8/O9 (`:506-532`) — duplicate sample detection = name intersection.
  */
object ProjectCombiner {

  final case class MergeStats(left: Long, right: Long, merged: Long) {
    /** The reference's `:253-256` warning condition. */
    def lossy: Boolean = merged < left || merged < right
  }

  /** O7 — union two report tables by column name. */
  def unionReports(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  /** J2 — inner matrix merge on the id column; the id column of the right matrix is
    * dropped (GNU join emits the key once, `:238-246`). Returns merge stats so the
    * caller can reproduce the row-loss warning.
    *
    * Stats cost ONE job: a full-outer join of the two id columns tallies
    * left/right/matched counts in a single pass (matrix ids are unique per file by
    * the reference's own contract, `rsem-generate-data-matrix:46-54`, so the outer
    * row count per side equals the input row count) — instead of three uncached
    * actions recomputing both inputs and the join. The returned `merged` frame is
    * lazy and untouched. */
  def mergeMatrices(a: DataFrame, b: DataFrame,
                    idCol: String = "Symbol"): (DataFrame, MergeStats) = {
    val merged = a.join(b, Seq(idCol), "inner")
    val ids = a.select(col(idCol)).withColumn("_in_a", lit(1))
      .join(b.select(col(idCol)).withColumn("_in_b", lit(1)), Seq(idCol), "full_outer")
    val r = ids.agg(
      count(col("_in_a")).as("l"), count(col("_in_b")).as("r"),
      count(when(col("_in_a").isNotNull && col("_in_b").isNotNull, 1)).as("m")).head()
    (merged, MergeStats(r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  /** J8 — samples present in both runs (`comm -12` over sorted name lists). */
  def duplicateSamples(a: DataFrame, b: DataFrame,
                       nameCol: String = "geo_accession"): DataFrame =
    a.select(col(nameCol)).intersect(b.select(col(nameCol)))
}
