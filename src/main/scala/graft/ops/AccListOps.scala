package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AccList relational transforms: dedup, run-grouping, distinct samples, derived names.
  *
  * These are the reference's sample-bookkeeping steps in
  * `run_RNApipeline_pairedG8_diskGuard.bash` — all pure DataFrame ops.
  */
object AccListOps {

  /** O2 — dedup keep-FIRST row per key (`run_RNApipeline…:362-366`,
    * `sort -u -t$'\t' -k2,2` under a preserved header: GNU sort -u on a single key
    * keeps the first input row of each key group). Spark's `dropDuplicates` keeps an
    * *arbitrary* row, so determinism needs an explicit order column — the readers
    * provide in-file `_row_order` (SURVEY O2).
    *
    * Scale: window over (key, order) — one shuffle by key, streaming rank, no skew
    * risk at realistic key cardinality. */
  def dedupKeepFirst(df: DataFrame, key: String = "geo_accession",
                     orderCol: String = "_row_order"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** O1 — distinct sample list (`run_RNApipeline…:258-265`,
    * `cut -f2 | tail -n +2 | sort | uniq | grep -v '^$'`). */
  def distinctSamples(accList: DataFrame): DataFrame =
    accList.filter(length(trim(col("geo_accession"))) > 0)
      .select(col("geo_accession")).distinct()

  /** J7 — runs-per-sample grouping (`run_RNApipeline…:279-296`): per distinct GSM,
    * collect its SRR runs and comma-join them (the STAR multi-run input list).
    * Run order within a sample follows AccList file order via `_row_order`. */
  def groupRuns(accList: DataFrame): DataFrame =
    accList
      .groupBy(col("geo_accession"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("_row_order"), col("Run")))),
          s => s.getField("Run")), ",").as("runs"),
        count(lit(1)).as("n_runs"))

  /** P3 — derived `unique_name` = Tissue_Strain_Sex_geo_accession
    * (`run_RNApipeline…:286,560`). */
  def withUniqueName(accList: DataFrame): DataFrame =
    accList.withColumn("unique_name",
      concat_ws("_", col("Tissue"), col("Strain"), col("Sex"), col("geo_accession")))

  /** A1 — sample count + small/large classification (`sample_counting.sh:48-55`,
    * `bulk_orchestrator…:73-91,255-263`; threshold 20 at `:34`). */
  def classifyProject(accList: DataFrame, smallMax: Long = 20L): (Long, String) = {
    val n = distinctSamples(accList).count()
    (n, if (n <= smallMax) "small" else "large")
  }
}
