package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic first-seen color assignment for track grouping (C5) — the one
  * place in the reference where row-*order* semantics matter.
  *
  * Re-expresses `make_jbrowse_session_for_bioproject.py:33-39,81-145`:
  *   - tracks are visited in sorted-path order (`:70`),
  *   - each new composite group key gets `palette[n_assigned % 10]` (`:33-39`),
  *   - composite key = `Tissue=…;Strain=…;Sex=…;SampleChar=…` with normalized
  *     whitespace, strain truncated at the first comma, all-empty → `Unknown`
  *     (`:131-143`).
  *
  * First-seen order == rank of each group's MINIMUM track path, so the assignment is
  * `dense_rank` over `min(path) per group` (SURVEY C5). The global window runs over
  * one row per *group* (tens of rows), not per track — safe on the driver-sized side
  * of a broadcast join even at large track counts.
  */
object ColorAssigner {

  /** Matplotlib tab10 — `make_jbrowse_session_for_bioproject.py:33-39` palette. */
  val Palette: Seq[String] = Seq(
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf")

  /** F8/F9/F10 — composite grouping key from track metadata columns. */
  def comboKey(df: DataFrame): DataFrame = {
    def norm(c: String) = regexp_replace(trim(coalesce(col(c), lit(""))), "\\s+", " ")
    val tissue = norm("Tissue")
    val strain = trim(split(norm("Strain"), ",").getItem(0))
    val sex = norm("Sex")
    val sampleChar = norm("Sample_characteristics")
    df.withColumn("combo_key",
      when(length(tissue) === 0 && length(strain) === 0 &&
           length(sex) === 0 && length(sampleChar) === 0, lit("Unknown"))
        .otherwise(concat(
          lit("Tissue="), tissue, lit(";Strain="), strain,
          lit(";Sex="), sex, lit(";SampleChar="), sampleChar)))
  }

  /** Assign `color` to every track row by first-seen group order.
    *
    * @param tracks  frame containing `groupCol` and `orderCol` (track path)
    */
  def assign(tracks: DataFrame, groupCol: String = "combo_key",
             orderCol: String = "_path"): DataFrame = {
    val firstSeen = tracks
      .groupBy(col(groupCol))
      .agg(min(col(orderCol)).as("_first_path"))
      .withColumn("_rank",
        row_number().over(Window.orderBy(col("_first_path"), col(groupCol))) - 1)
      .withColumn("color",
        element_at(
          array(Palette.map(lit): _*),
          (col("_rank") % Palette.size).cast("int") + 1))
      .select(col(groupCol), col("color"))
    tracks.join(broadcast(firstSeen), Seq(groupCol))
  }
}
