package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for multi-dimensional scan pruning — the
  * storage-side lever the rest of the engine's read paths assume at 100 TB.
  *
  * Parquet scans skip whole files/row groups from footer min/max statistics,
  * but only for columns the layout actually clusters: a table sorted by `x`
  * prunes `x` predicates and nothing else. Interleaving the bits of several
  * bucketized columns into one Morton (Z-order) value and range-sorting by
  * it keeps EVERY interleaved column locally clustered, so a box predicate
  * (`x BETWEEN … AND y BETWEEN …`) prunes on all of them at once — the
  * technique Delta/Iceberg expose as `OPTIMIZE ZORDER BY` (Morton 1966).
  *
  * Everything here is composed from built-in integer functions — the
  * z-value is a fixed chain of shift/mask/add terms (disjoint bit fields,
  * so `+` ≡ bitwise OR), codegen-friendly and reproducible as an unrolled
  * SQL chain (oracle q122).
  */
object Layout {

  /** Morton (Z-order) value of `cols`: bit `b` of column `i` lands at
    * interleaved position `b·n + i`. Columns must be non-negative and fit
    * `bits` bits (bucketize first — e.g. `least(x, lit((1 << bits) - 1))`);
    * `n·bits` must stay under the long sign bit so z-ORDER comparisons are
    * magnitude comparisons. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits exceeds 63 usable bits")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Clamp a non-negative numeric column into the `bits`-bit bucket domain
    * (the usual prep for [[zValue]] dimensions with open-ended ranges). */
  def bucket(c: Column, bits: Int): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))

  /** Write `df` Z-ordered by `dims`: range-partition on the z-value (so file
    * k holds a contiguous z-range — file-level min/max stats stay tight),
    * sort within partitions by it (row-group-level stats too), drop the
    * helper column. `numFiles` sizes the output files; at corpus scale pick
    * it from bytes/target-file-size. One shuffle (the range exchange) — the
    * same cost any global sort pays; the z-column itself is scan-side.
    *
    * The range exchange samples the z distribution, so skewed dimensions
    * still yield balanced files — a plain `repartition(hash)` would balance
    * too but destroy the clustering this exists for. */
  def zorderWrite(df: DataFrame, dims: Seq[Column], bits: Int,
                  outPath: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("_z", zValue(dims, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outPath)
  }

  /** Comparison layout: linear order by one column (what a naive pipeline
    * writes) — prunes predicates on that column only. */
  def linearWrite(df: DataFrame, dim: Column, outPath: String,
                  numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("_k", dim)
      .repartitionByRange(numFiles, col("_k"))
      .sortWithinPartitions(col("_k"))
      .drop("_k")
      .write.mode("overwrite").parquet(outPath)
  }
}
