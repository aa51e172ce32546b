package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's file formats.
  *
  * Never inferred (SURVEY §1.3): the reference binds column meaning positionally
  * (`run_SRA2QC_diskGuard.bash:91` `while IFS=$'\t' read -r Run geo_accession Tissue ...`),
  * so every reader declares its `StructType` up front.
  *
  * Numeric columns that the reference compares or passes through as *formatted text*
  * (RSEM `TPM` vs the literal `"0.00"`, `GeneTPMbed_v2.sh:124`) are kept as `StringType`
  * with typed companions added by the readers — byte-exact passthrough is part of the
  * output contract (SURVEY §7.4).
  */
object Schemas {

  /** AccList: 10 fixed tab-separated string columns (`docs/example_AccList.txt:1`). */
  val accListColumns: Seq[String] = Seq(
    "Run", "geo_accession", "Tissue", "Strain", "Sex", "PMID", "GEOpath",
    "Title", "Sample_characteristics", "StrainInfo")

  val accList: StructType =
    StructType(accListColumns.map(StructField(_, StringType, nullable = true)))

  /** Project list: `<acclist> <project> <readlen>`, whitespace-split, readlen
    * defaults to 150 (`bulk_orchestrator_production_diskGuard.bash:220-231`). */
  val projectList: StructType = StructType(Seq(
    StructField("acclist", StringType),
    StructField("project", StringType),
    StructField("read_length", IntegerType)))

  /** samtools idxstats: contig, length, mapped, unmapped (`ComputeSex_v5.sh:111-117`). */
  val idxStats: StructType = StructType(Seq(
    StructField("contig", StringType),
    StructField("length", LongType),
    StructField("mapped", LongType),
    StructField("unmapped", LongType)))

  /** RSEM `.genes.results` / `.isoforms.results`: header + 7 columns
    * (`dependencies/rsem-generate-data-matrix:16`). Value columns stay strings —
    * the matrix builder passes the raw text through and downstream filters compare
    * formatted strings; readers add `_d`-suffixed double casts for analytics. */
  val rsemResults: StructType = StructType(Seq(
    StructField("gene_id", StringType),
    StructField("transcript_ids", StringType),
    StructField("length", StringType),
    StructField("effective_length", StringType),
    StructField("expected_count", StringType),
    StructField("TPM", StringType),
    StructField("FPKM", StringType)))

  /** Reference gene/transcript BED (sorted, name in col 4; `GeneTPMbed_v2.sh:49,93-99`).
    * Only the first 4 columns are consumed by the TPM merge. */
  val bed4: StructType = StructType(Seq(
    StructField("chrom", StringType),
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("name", StringType)))

  /** STARQC summary (`pSTARQC_v1.sh:63`): SampleID, input_reads, unaligned_reads,
    * Unmapped_Rate (2 dp), Status ∈ {PASS, FAIL, NO_LOG, INVALID_LOG}.
    * Numerics nullable: the reference writes the literal `NA` there (rendered by the
    * TSV sink, not stored). */
  val starQc: StructType = StructType(Seq(
    StructField("SampleID", StringType, nullable = false),
    StructField("input_reads", LongType),
    StructField("unaligned_reads", LongType),
    StructField("Unmapped_Rate", DoubleType),
    StructField("Status", StringType, nullable = false)))

  /** Sex result (`ComputeSex_v5.sh:148`): SampleID, InputSex, ComputedSex, Ratio
    * (bc scale=6 text incl. the literal `Inf`), Agreement ∈ {Agree, Conflict}. */
  val sexResult: StructType = StructType(Seq(
    StructField("SampleID", StringType, nullable = false),
    StructField("InputSex", StringType),
    StructField("ComputedSex", StringType, nullable = false),
    StructField("Ratio", StringType, nullable = false),
    StructField("Agreement", StringType, nullable = false)))
}
