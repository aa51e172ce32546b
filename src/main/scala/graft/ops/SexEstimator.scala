package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ComputeSex — chrX/chrY coverage-ratio sex classification.
  *
  * Re-expresses `ComputeSex_v5.sh:111-144`:
  *   - `x_cov = x_mapped / x_len` and `y_cov = y_mapped / y_len` at bc `scale=6`
  *     (bc *truncates* toward zero, it does not round),
  *   - `y_cov == 0` → `Ratio = "Inf"`, sex `F` (divide-by-zero sentinel),
  *   - else `ratio = x_cov / y_cov` at scale 6; `ratio > 40.00` → `F`, else `M`,
  *   - `Agreement = Agree` iff metadata sex equals computed sex, else `Conflict`.
  *
  * bc's truncating scale-6 arithmetic is reproduced *exactly* in integer space:
  * `trunc6(a/b) == (a*1_000_000) div b` for non-negative longs, and the ratio of two
  * scale-6 fixed-point values `(x/1e6)/(y/1e6)` truncated to scale 6 is
  * `(x*1_000_000) div y`. Everything stays in whole-stage-codegen'd long arithmetic
  * (SQL `div` = exact integral division) — no Decimal, no UDF — so at 100 TB this is
  * one partial-aggregated groupBy over idxstats rows plus a broadcast metadata join.
  */
object SexEstimator {

  /** Truncating scale-6 fixed-point division of two SQL fragments. */
  private def trunc6(num: String, den: String): Column =
    expr(s"(($num) * 1000000L) div ($den)")

  /** bc-style text for a scale-6 fixed-point value held in column `u`:
    * always 6 fractional digits, no leading zero for |v| < 1 (bc prints `.123456`). */
  def formatScale6(u: String): Column = expr(
    s"""concat(
       |  case when ($u) div 1000000L = 0 then ''
       |       else cast(($u) div 1000000L as string) end,
       |  '.', lpad(cast(($u) % 1000000L as string), 6, '0'))""".stripMargin)

  /** @param idx  (sample_id, contig, length, mapped, unmapped) idxstats rows
    * @param meta (SampleID, InputSex) — AccList `Sex` column per sample
    * @param xContig / yContig contig names (`grep -P "chrX\s"` row lookup)
    * @return Schemas.sexResult columns + `ratio_num` (double, null when Inf) */
  def estimate(idx: DataFrame, meta: DataFrame,
               xContig: String = "chrX", yContig: String = "chrY"): DataFrame = {
    val cov = idx
      .groupBy(col("sample_id"))
      .agg(
        sum(when(col("contig") === xContig, col("mapped"))).as("x_map"),
        sum(when(col("contig") === xContig, col("length"))).as("x_len"),
        sum(when(col("contig") === yContig, col("mapped"))).as("y_map"),
        sum(when(col("contig") === yContig, col("length"))).as("y_len"))
      .select(
        col("sample_id"),
        trunc6("x_map", "x_len").as("x_cov_u"),
        trunc6("y_map", "y_len").as("y_cov_u"))

    val yZero = col("y_cov_u") === 0L
    val classified = cov
      .withColumn("ratio_u", when(yZero, lit(null)).otherwise(trunc6("x_cov_u", "y_cov_u")))
      .select(
        col("sample_id").as("SampleID"),
        when(yZero, lit("F"))
          .when(col("ratio_u") > 40L * 1000000L, lit("F"))
          .otherwise(lit("M")).as("ComputedSex"),
        when(yZero, lit("Inf")).otherwise(formatScale6("ratio_u")).as("Ratio"),
        (col("ratio_u").cast("double") / 1000000.0).as("ratio_num"))

    meta.join(classified, Seq("SampleID"), "inner")
      .select(
        col("SampleID"), col("InputSex"), col("ComputedSex"), col("Ratio"),
        when(col("InputSex") === col("ComputedSex"), "Agree")
          .otherwise("Conflict").as("Agreement"),
        col("ratio_num"))
  }
}
