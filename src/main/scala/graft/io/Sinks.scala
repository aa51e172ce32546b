package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Writers for the reference's text output contracts (SURVEY §2.1 S9–S11, §7.4-1).
  *
  * The reference publishes small, single-file, header-first TSV reports atomically
  * (`pSTARQC_v1.sh:46,99` tmp + mv). These writers reproduce that contract: write a
  * 1-partition Spark CSV into a temp dir, then move the part file to the final path.
  * `coalesce(1)` is confined to these FINAL report sinks — never mid-pipeline
  * (SURVEY §7.4-6); big data (matrices at scale, coverage bins) should instead be
  * written partitioned parquet via plain `df.write`.
  */
object Sinks {

  /** S9 — atomic single-file TSV report: tab sep, header row, nulls rendered as the
    * reference's `NA` sentinel. */
  def writeTsvReport(df: DataFrame, outFile: String, nullValue: String = "NA"): Unit = {
    val tmpDir = outFile + ".tmp"
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("nullValue", nullValue).option("emptyValue", "")
      .csv(tmpDir)
    publishSingleFile(tmpDir, outFile)
  }

  /** S10 — RSEM matrix text contract (`rsem-generate-data-matrix:76-89`):
    * header `Symbol<TAB>"<source1>"…` (sources quoted, `Symbol` not), data rows
    * `"<feature-id>"<TAB>v1…` with raw value passthrough. */
  def writeMatrix(matrix: DataFrame, outFile: String, idHeader: String = "Symbol"): Unit = {
    val sources = matrix.columns.filterNot(_ == idHeader)
    val header = (idHeader +: sources.map(s => "\"" + s + "\"")).mkString("\t")
    val line = concat_ws("\t",
      concat(lit("\""), col(idHeader), lit("\"")) +:
        sources.map(s => col(s"`$s`").cast("string")).toIndexedSeq: _*)
    val tmpDir = outFile + ".tmp"
    matrix.select(line.as("line")).coalesce(1)
      .write.mode("overwrite").option("quote", "").text(tmpDir)
    publishSingleFile(tmpDir, outFile, Some(header))
  }

  /** S12 — BED sink: genome-position-sorted single text file (bgzip/tabix indexing is
    * an external post-step, out of relational scope). */
  def writeBed(bed: DataFrame, outFile: String): Unit = {
    val tmpDir = outFile + ".tmp"
    bed.select(concat_ws("\t", bed.columns.toIndexedSeq.map(c => col(s"`$c`").cast("string")): _*).as("line"))
      .coalesce(1)
      .write.mode("overwrite").option("quote", "").text(tmpDir)
    publishSingleFile(tmpDir, outFile)
  }

  /** JSONL (one JSON object per line) sink — the lingua-franca interchange
    * format of training-data pipelines. Field order is pinned by the caller's
    * column order (to_json preserves struct field order), so output is
    * byte-deterministic given deterministic row content; JSON escaping of
    * quotes/tabs/newlines is the writer's, proven by the q103 round-trip.
    * Atomic single-file publish like the TSV sinks — for sharded corpus-scale
    * output use [[writePartitionedParquet]]-style partitioned `df.write.json`
    * instead. */
  def writeJsonl(df: DataFrame, outFile: String): Unit = {
    val tmpDir = outFile + ".tmp"
    df.select(to_json(struct(df.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)).as("line"))
      .coalesce(1)
      .write.mode("overwrite").option("quote", "").text(tmpDir)
    publishSingleFile(tmpDir, outFile)
  }

  /** Large-data parquet sink with file-count discipline — the opposite regime
    * from the single-file report sinks above. At 100 TB the failure mode is
    * SMALL FILES: a shuffle with thousands of tasks writing into hundreds of
    * partition values creates tasks×values fragments, and every downstream scan
    * pays per-file open cost. This sink repartitions by the partition columns
    * first (one task per live partition value, so each value gets ONE file
    * unless `maxRecordsPerFile` splits it) and lets the writer roll files at
    * the record cap — bounded file count AND bounded file size.
    *
    * Skewed partition values: a value bigger than `maxRecordsPerFile` still
    * splits correctly (the cap is enforced by the writer, per task). */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "use plain df.write for unpartitioned output")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** [[writePartitionedParquet]] with WITHIN-partition clustering: rows in
    * each partition value are sorted by `clusterBy` before the writer rolls
    * files at the record cap, so every rolled file (and row group) covers a
    * contiguous `clusterBy` range — parquet min/max stats stay tight on the
    * clustered dimensions and predicate scans prune files the hash layout
    * would have to read. Same shuffle count as the plain sink (the
    * repartition); the sort is task-local. The natural `clusterBy` for
    * multi-dimensional predicates is a [[graft.operators.Layout.zValue]]. */
  def writePartitionedParquetClustered(df: DataFrame, path: String,
                                       partitionCols: Seq[String],
                                       clusterBy: org.apache.spark.sql.Column,
                                       maxRecordsPerFile: Long = 5000000L): Unit = {
    require(partitionCols.nonEmpty, "use plain df.write for unpartitioned output")
    // sort by (partitionCols, clusterBy), not clusterBy alone: the dynamic-
    // partition writer requires an ordering on the partition columns and
    // RE-SORTS the task's rows by them when unsatisfied — an unstable sort
    // that scrambles the clustering (measured: out-of-order z-values inside
    // a written file). A child ordering prefixed by the partition columns
    // satisfies the writer's requirement, so the cluster order survives.
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions(partitionCols.map(col) :+ clusterBy: _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Compact a fragmented parquet dataset: rewrite `inPath` to `outPath` with
    * file count sized from the INPUT'S ACTUAL BYTES (ceil(totalBytes /
    * targetFileBytes)), not a guessed partition number. This is the maintenance
    * half of small-files discipline — ingestion tails, streaming micro-batches,
    * and per-sample writers all leave thousands-of-tiny-files datasets whose
    * downstream scans pay per-file open + footer-read cost; periodic compaction
    * is how 100 TB tables stay scannable.
    *
    * Sizing reads file lengths from the filesystem listing (a metadata
    * operation, no data scan). Rewrites to a NEW path: parquet readers can't
    * atomically replace a directory being read; publishing by rename/swap is
    * the caller's (or table format's) job. Uses coalesce — a narrow,
    * shuffle-free merge of input splits — because compaction only merges
    * what's already there; use `writePartitionedParquet` when a layout CHANGE
    * (partition columns) is wanted. */
  def compactParquet(df: DataFrame, inPath: String, outPath: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.coalesce(nFiles).write.mode("overwrite").parquet(outPath)
  }

  /** Children of `dir`, with the directory stream closed (Files.list leaks an fd
    * per call otherwise — these sinks run in per-sample/per-project loops). */
  private def listChildren(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** tmp-dir + atomic-move publish (C8): find the single part file, optionally
    * prepend a header, move into place, drop the temp dir. */
  private def publishSingleFile(tmpDir: String, outFile: String,
                                prependHeader: Option[String] = None): Unit = {
    val dir = Paths.get(tmpDir)
    val part = listChildren(dir)
      .find(p => p.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file under $tmpDir"))
    val target = Paths.get(outFile)
    prependHeader match {
      case Some(h) =>
        val staged = dir.resolve("staged")
        val out = Files.newOutputStream(staged)
        try {
          out.write((h + "\n").getBytes("UTF-8"))
          Files.copy(part, out)
        } finally out.close()
        Files.move(staged, target, StandardCopyOption.REPLACE_EXISTING)
      case None =>
        Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    }
    deleteRecursively(dir)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listChildren(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
