package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MultiQC-lite QC aggregation (SURVEY §2.1 S16 companion): the reference runs
  * MultiQC over every sample's FastQC output to get one per-project QC report
  * (`run_SRA2QC_diskGuard.bash:159-165` — report named
  * `${BIOProjectID}_fastq_multiQC_report`; `RSEMmatrix_v5.sh:126-128`). The
  * binary stays an external stage; the relational core — collecting
  * (sample, module, status) triples and pivoting them into the per-project
  * sample × module status matrix — is what these operators reproduce over
  * [[graft.io.TsvSources.readQcSummaries]] frames.
  */
object QcSummary {

  /** FastQC's eleven standard modules, report order. */
  val StandardModules: Seq[String] = Seq(
    "Basic Statistics", "Per base sequence quality", "Per tile sequence quality",
    "Per sequence quality scores", "Per base sequence content",
    "Per sequence GC content", "Per base N content",
    "Sequence Length Distribution", "Sequence Duplication Levels",
    "Overrepresented sequences", "Adapter Content")

  /** The per-project QC matrix: one row per sample, one column per module,
    * cells are PASS/WARN/FAIL (null = module absent for that sample). The module
    * list is explicit — like the matrix pivot (A7), no collect-distinct job
    * precedes the shuffle, so the plan is one pass at any corpus size.
    *
    * Duplicate (sample, module) rows — e.g. the R1 and R2 reads of a paired-end
    * sample each produce a summary line — resolve to the WORST status by
    * explicit severity rank (FAIL > WARN > PASS), not lexicographic min (which
    * would let PASS shadow WARN since "PASS" < "WARN"). */
  def pivotStatuses(qc: DataFrame, modules: Seq[String] = StandardModules): DataFrame = {
    val rank = when(col("status") === "FAIL", 0)
      .when(col("status") === "WARN", 1)
      .when(col("status") === "PASS", 2)
      .otherwise(3) // unknown statuses never out-rank a real one
    qc.withColumn("_sev", rank)
      .groupBy(col("sample")).pivot("module", modules)
      .agg(min(struct(col("_sev"), col("status"))).getField("status"))
  }

  /** MultiQC's headline tallies: how many samples PASS/WARN/FAIL each module. */
  def statusCounts(qc: DataFrame): DataFrame =
    qc.groupBy(col("module"), col("status")).agg(count(lit(1)).as("n"))

  /** Samples failing any of the given modules — the triage list. */
  def failingSamples(qc: DataFrame, modules: Seq[String] = StandardModules): DataFrame =
    qc.filter(col("status") === "FAIL" && col("module").isin(modules: _*))
      .select(col("sample"), col("module"))
      .distinct()
}
