package graft.io

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Readers for the reference's TSV / semi-structured file formats (SURVEY §2.1).
  *
  * Shared conventions of the reference, preserved here:
  *   - header + `#`-comment + blank-line skipping (`sample_counting.sh:36` `NR>1 && !/^#/`),
  *   - CRLF tolerance (`combine_multStrategy_Directories.bash:112-116` `sed 's/\r//g'`),
  *   - sample identity derived from file names (`pSTARQC_v1.sh:72`,
  *     `rsem-generate-data-matrix:72` basename-as-column-header).
  *
  * All readers return plain DataFrames with explicit schemas; none infer.
  */
object TsvSources {

  /** S1 — AccList scan: 10 fixed cols, one header row, `#`-comments and blank/blank-key
    * rows dropped (`run_SRA2QC_diskGuard.bash:91-113`, `sample_counting.sh:36-43`).
    *
    * `_row_order` is a composite (source file path, in-file id) sort key — needed by
    * keep-*first* dedup (SURVEY O2). Ordering across files follows sorted path (the
    * reference concatenates glob-sorted files); within a file the id follows read
    * order, exact for any file up to one scan split (`files.maxPartitionBytes`,
    * 128 MB — an AccList is KBs by design). */
  def readAccList(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .option("comment", "#").option("mode", "PERMISSIVE")
      .schema(Schemas.accList)
      .csv(path)
      .filter(col("Run").isNotNull && length(trim(col("Run"))) > 0 &&
        col("geo_accession").isNotNull && length(trim(col("geo_accession"))) > 0)
      .withColumn("_row_order",
        struct(input_file_name().as("src"), monotonically_increasing_id().as("line")))

  /** S2 — project-list scan: whitespace-split 3 cols, `#`-comments, readlen default 150
    * (`bulk_orchestrator_production_diskGuard.bash:220-231`). */
  def readProjectList(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(regexp_replace(col("value"), "\r", "")).as("line"))
      .filter(length(col("line")) > 0 && !col("line").startsWith("#"))
      .select(split(col("line"), "\\s+").as("f"))
      .select(
        get(col("f"), lit(0)).as("acclist"),
        get(col("f"), lit(1)).as("project"),
        coalesce(get(col("f"), lit(2)).cast(IntegerType), lit(150)).as("read_length"))

  /** S3 — STAR `Log.final.out` scan: `key |<tab>value` lines → (sample_id, key, value);
    * values trimmed with commas stripped (`pSTARQC_v1.sh:49-61`). Sample id comes from
    * the `<sample>_STARLog.final.out` file name (`pSTARQC_v1.sh:72`). */
  def readStarLogs(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)
      .withColumn("sample_id",
        regexp_replace(regexp_extract(input_file_name(), "[^/]+$", 0),
          "_STARLog\\.final\\.out$", ""))
      // in-file line order for awk's first-match-wins (`pSTARQC_v1.sh:50-61`
      // `exit` after match); a STAR log is ~30 lines = always one scan split.
      .withColumn("_line_order", monotonically_increasing_id())
      .filter(col("value").contains("|"))
      .select(
        col("sample_id"),
        // awk-style strip of [ \t]+ at both ends (Spark's trim removes spaces only)
        regexp_replace(substring_index(col("value"), "|", 1), "^[ \\t]+|[ \\t]+$", "").as("key"),
        regexp_replace(
          regexp_replace(substring_index(col("value"), "|", -1), "^[ \\t]+|[ \\t]+$", ""),
          ",", "").as("value"),
        col("_line_order"))

  /** S4 — samtools idxstats scan: 4 cols, no header (`ComputeSex_v5.sh:111-117`);
    * sample id from the `<sample>_idxstats.txt` file name. */
  def readIdxStats(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .option("sep", "\t").schema(Schemas.idxStats).csv(paths: _*)
      .withColumn("sample_id",
        regexp_replace(regexp_extract(input_file_name(), "[^/]+$", 0),
          "_idxstats\\.txt$", ""))

  /** S5 — RSEM results scan: header + 7 cols (`rsem-generate-data-matrix:16,28-43`).
    * Adds `source_file` (basename — the matrix column-header contract, F5),
    * `sample` (basename minus `.genes/.isoforms/.transcripts.results`, F6) and
    * typed casts `TPM_d` / `expected_count_d` for analytics. */
  def readRsemResults(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .schema(Schemas.rsemResults).csv(paths: _*)
      .withColumn("source_file", regexp_extract(input_file_name(), "[^/]+$", 0))
      .withColumn("sample",
        regexp_replace(col("source_file"),
          "\\.(genes|isoforms|transcripts|alleles)\\.results$", ""))
      .withColumn("TPM_d", col("TPM").cast(DoubleType))
      .withColumn("expected_count_d", col("expected_count").cast(DoubleType))

  /** S6 — reference BED scan: sorted, no header, name in col 4
    * (`GeneTPMbed_v2.sh:49,93-99`). */
  def readBed(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(Schemas.bed4).csv(path)

  /** S16 — FastQC `summary.txt` scan (the MultiQC-lite input surface):
    * `STATUS<TAB>Module Name<TAB>file` triples, no header, CRLF-tolerant (P13).
    * The reference aggregates exactly these per-sample summaries with MultiQC
    * (`run_SRA2QC_diskGuard.bash:159-165`, `RSEMmatrix_v5.sh:126-128`); running
    * the MultiQC *binary* stays external, but parsing + aggregating the
    * summaries is in-scope relational work. `sample` is derived from the
    * reported sequence-file name minus its extensions (F5/F6 discipline). */
  def readQcSummaries(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)
      .select(regexp_replace(col("value"), "\r$", "").as("line"),
        input_file_name().as("source_path"))
      .filter(length(trim(col("line"))) > 0)
      .select(split(col("line"), "\t").as("f"), col("source_path"))
      .select(
        get(col("f"), lit(0)).as("status"),
        get(col("f"), lit(1)).as("module"),
        get(col("f"), lit(2)).as("file"),
        col("source_path"))
      .withColumn("sample",
        regexp_replace(col("file"), "\\.(fastq|fq|bam|sam)(\\.gz)?$", ""))

  /** S7 — track-JSON glob scan: recursive `RNAseq_*.json`, excluding
    * `*geneTPMbed*` / `*TXTPMbed*`, path-sorted downstream
    * (`make_jbrowse_session_for_bioproject.py:62-70`). One JSON doc per file. */
  def readTrackJsons(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.option("multiLine", "true").json(pathGlob)
      .withColumn("_path", input_file_name())
      .filter(!col("_path").contains("geneTPMbed") && !col("_path").contains("TXTPMbed"))
}
