package graft

import java.nio.file.{Files, Paths}

import graft.io.{Sinks, TsvSources}
import graft.ops._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end run of SURVEY §7.2's minimum slice — "gene TPM matrix + sex-conflict
  * report + session JSON for one project" — over generated fixture files, with no
  * external kernels (STAR/RSEM outputs are fixtures, as if already run).
  *
  * Usage: `sbt "runMain graft.PipelineDemo /tmp/demo_out"`.
  * Writes: STARQC report, sex_result, genes.TPM.matrix, conflict report, session
  * JSON — the reference's step-2 artifact set (`run_RNApipeline…` stages 4–11).
  */
object PipelineDemo {

  private def write(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }

  private def starLog(input: Long, short: Long): String =
    s"""                          Number of input reads |\t$input
       |      Number of reads unmapped: too short |\t$short
       | Number of reads unmapped: too many mismatches |\t0
       |           Number of reads unmapped: other |\t0
       |""".stripMargin

  private def rsem(rows: (String, String)*): String =
    "gene_id\ttranscript_id(s)\tlength\teffective_length\texpected_count\tTPM\tFPKM\n" +
      rows.map { case (g, tpm) => s"$g\tNM_X\t1000.00\t900.00\t50.00\t$tpm\t1.00" }
        .mkString("\n") + "\n"

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_demo")
    val fixDir = outDir + "/fixtures"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ── fixtures: 3 samples; GSM3 fails the alignment gate ──────────────────
    val accPath = write(fixDir, "AccList.txt",
      "Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\tTitle\tSample_characteristics\tStrainInfo\n" +
        "SRR1\tGSM1\tLiver\tBN/NHsdMcwi\tM\t111\thttp://geo/1\tStudy\tage: 12w\thttp://rgd/1\n" +
        "SRR2\tGSM1\tLiver\tBN/NHsdMcwi\tM\t111\thttp://geo/1\tStudy\tage: 12w\thttp://rgd/1\n" +
        "SRR3\tGSM2\tBrain\tSHR\tF\t111\thttp://geo/1\tStudy\tage: 12w\thttp://rgd/2\n" +
        "SRR4\tGSM3\tHeart\tF344\tM\t111\thttp://geo/1\tStudy\tage: 12w\thttp://rgd/3\n")
    val logs = Seq(
      write(fixDir, "GSM1_STARLog.final.out", starLog(25000000, 1200000)),
      write(fixDir, "GSM2_STARLog.final.out", starLog(20000000, 800000)),
      write(fixDir, "GSM3_STARLog.final.out", starLog(10000000, 8000000))) // 80% → FAIL
    val idx = Seq(
      write(fixDir, "GSM1_idxstats.txt", "chrX\t159970021\t4500000\t0\nchrY\t18315841\t250000\t0\n"),
      write(fixDir, "GSM2_idxstats.txt", "chrX\t159970021\t4500000\t0\nchrY\t18315841\t0\t0\n"))
    val rsems = Seq(
      write(fixDir, "GSM1.genes.results", rsem("Xist" -> "1.20", "Uty" -> "55.00", "Actb" -> "900.00")),
      write(fixDir, "GSM2.genes.results", rsem("Xist" -> "812.44", "Uty" -> "0.00", "Actb" -> "850.00")))

    // ── the dataflow (SURVEY §3.3 stages 4–10) ──────────────────────────────
    val accList = TsvSources.readAccList(spark, accPath)
    val deduped = AccListOps.dedupKeepFirst(accList)                        // O2
    val samples = deduped.select(col("geo_accession").as("SampleID"))
    val qc = StarQc.summarize(TsvSources.readStarLogs(spark, logs: _*), samples) // S3+A3+P4
    Sinks.writeTsvReport(StarQc.reportView(qc).orderBy("SampleID"),
      s"$outDir/PRJDEMO_STAR_Align_sum.txt")

    val passed = StarQc.passFilter(deduped, qc)                             // J1
    val sex = SexEstimator.estimate(                                        // A4+P5+P6
      TsvSources.readIdxStats(spark, idx: _*),
      passed.select(col("geo_accession").as("SampleID"), col("Sex").as("InputSex")))
    Sinks.writeTsvReport(sex.drop("ratio_num").orderBy("SampleID"), s"$outDir/PRJDEMO_sex_result.txt")

    val rsemLong = TsvSources.readRsemResults(spark, rsems)                 // S5
    val matrix = MatrixBuilder.pivotMatrix(rsemLong, "gene_id", "source_file", "TPM",
      sources = rsems.map(p => Paths.get(p).getFileName.toString))          // A7+J6
    Sinks.writeMatrix(matrix.orderBy("Symbol"), s"$outDir/PRJDEMO.genes.TPM.matrix")

    val conflict = ConflictReport.fromMatrix(sex, matrix)                   // J5+P9
    // reference prints empty strings (not NA) for markers missing from the matrix
    Sinks.writeTsvReport(conflict.orderBy("SampleID"),
      s"$outDir/PRJDEMO_sex_conflict_report.txt", nullValue = "")

    val tracks = ColorAssigner.comboKey(                                    // C5+C6
      AccListOps.withUniqueName(passed)
        .join(sex.select(col("SampleID").as("geo_accession"), col("ComputedSex")),
          Seq("geo_accession"), "left"))
      .withColumn("trackId", concat(lit("RNAseq_"), col("unique_name")))
      .withColumn("_path", concat(lit(s"$outDir/"), col("geo_accession"), lit(".json")))
    tracks.select(col("trackId"), SessionBuilder.trackJson("PRJDEMO").as("doc"))
      .collect().foreach { r =>
        // strain names may contain '/' (BN/NHsdMcwi) — flatten for the FILE name
        write(outDir, r.getString(0).replace('/', '_') + ".json", r.getString(1))
      }
    write(outDir, "PRJDEMO_jbrowse_session_GRCr8.json",
      SessionBuilder.buildSession(tracks, "PRJDEMO",
        java.time.LocalDateTime.now().withNano(0).toString))

    println(s"[demo] artifacts under $outDir:")
    Files.list(Paths.get(outDir)).filter(Files.isRegularFile(_))
      .forEach(p => println(s"[demo]   ${p.getFileName}"))
    spark.stop()
  }
}
