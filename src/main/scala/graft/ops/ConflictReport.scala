package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sex-conflict report — marker-gene TPMs joined onto the sex table (J5 + P9 + F6).
  *
  * Re-expresses `ConflictedSampleReport_v4.sh:30-92`:
  *   - six marker genes (`:30`): Xist (female-high), Uty/Sry/Ddx3y/Kdm5d/Eif2s3y
  *     (male-high),
  *   - the TPM matrix is unpivoted, matrix column headers lose their
  *     `.genes.results` suffix to become sample ids (`:52`, F6) and feature ids
  *     lose their quotes (`:60`, F7),
  *   - INNER join against sex_result: samples with no TPM columns are silently
  *     dropped (`:81` `if [ -n "$match" ]` — preserved, not "fixed"; SURVEY §7.4-4).
  *
  * The v4 reference keeps all rows; filtering to Conflict-only is the commented-out
  * `:94-102` variant, exposed here as `conflictsOnly`.
  */
object ConflictReport {

  val MarkerGenes: Seq[String] = Seq("Xist", "Uty", "Sry", "Ddx3y", "Kdm5d", "Eif2s3y")

  /** @param sexResult Schemas.sexResult-shaped frame
    * @param tpmLong   (sample, gene, tpm) long-format expression values
    *                  (sample already suffix-stripped, gene already unquoted) */
  def build(sexResult: DataFrame, tpmLong: DataFrame,
            conflictsOnly: Boolean = false): DataFrame = {
    val markers = tpmLong
      .filter(col("gene").isin(MarkerGenes: _*))
      .groupBy(col("sample").as("SampleID"))
      .pivot("gene", MarkerGenes)
      .agg(first("tpm", ignoreNulls = true))

    val joined = sexResult
      .select("SampleID", "InputSex", "ComputedSex", "Ratio", "Agreement")
      .withColumnRenamed("Ratio", "XYRatio")
      .join(markers, Seq("SampleID"), "inner")
    if (conflictsOnly) joined.filter(col("Agreement") === "Conflict") else joined
  }

  /** Matrix-headed input path: unpivot a published matrix and normalize headers/ids
    * the way the awk parser does (`:43-66`). */
  def fromMatrix(sexResult: DataFrame, matrix: DataFrame,
                 idHeader: String = "Symbol"): DataFrame = {
    val long = MatrixBuilder.unpivot(matrix, idHeader)
      .select(
        regexp_replace(col("sample"), "\\.genes\\.results$", "").as("sample"),
        regexp_replace(col(idHeader), "\"", "").as("gene"),
        col("value").as("tpm"))
    build(sexResult, long)
  }
}
