package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class RegenPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def accList: DataFrame = Seq(
    ("SRR1", "GSM1", "Liver", "BN", "M", "1", "http://geo/1", "T1", "sc one", "SI1", 1L),
    ("SRR2", "GSM1", "Liver", "BN", "M", "1", "http://geo/1", "T1", "sc one", "SI1", 2L),
    ("SRR3", "GSM2", "Brain", "SHR", "F", "2", "http://geo/2", "T2", "sc two", "SI2", 3L))
    .toDF("Run", "geo_accession", "Tissue", "Strain", "Sex", "PMID", "GEOpath",
      "Title", "Sample_characteristics", "StrainInfo", "_row_order")

  private def sexResult: DataFrame =
    Seq(("GSM1", "M", "M", "2.5", "Agree"), ("GSM2", "F", "M", "3.0", "Conflict"))
      .toDF("SampleID", "InputSex", "ComputedSex", "Ratio", "Agreement")

  private def tpmLong: DataFrame = Seq(
    ("GSM1", "Xist", "0.10"), ("GSM1", "Uty", "55.00"),
    ("GSM2", "Xist", "812.44"), ("GSM2", "Uty", "40.00"))
    .toDF("sample", "gene", "tpm")

  test("regen rebuilds report, one track per unique sample (first run wins), and the session") {
    val out = tempDir()
    val r = RegenPipeline.regen(accList, sexResult, tpmLong, "PRJ1", out, "2026-01-01")
      .toOption.get
    // report published atomically with header
    val report = java.nio.file.Files.readString(java.nio.file.Paths.get(r.conflictReportPath))
    assert(report.startsWith("SampleID\t") && report.contains("GSM2"))
    // GSM1 appears once (SRR2 dropped by keep-first), both samples tracked
    assert(r.tracksWritten == Seq("Liver_BN_M_GSM1", "Brain_SHR_F_GSM2"))
    assert(r.failedSamples.isEmpty)
    // session exists and references both tracks
    val session = new ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(r.sessionPath.get)))
      .get("session")
    assert(session.get("name").asText() == "PRJ1_RNAseq_expression")
    assert(session.get("sessionTracks").size() == 2)
    // track doc on disk is valid JSON with the ComputedSex from the sex result
    val doc = new ObjectMapper().readTree(java.nio.file.Files.readString(
      out.resolve("tracks").resolve("RNAseq_Liver_BN_M_GSM1.json")))
    assert(doc.get("metadata").get("Computed Sex").asText() == "M")
  }

  test("BWJSON_REQUIRED=true: one failed track write aborts with no session") {
    val out = tempDir()
    val r = RegenPipeline.regen(accList, sexResult, tpmLong, "PRJ1", out, "2026-01-01",
      writeTrack = (uname, _) => uname != "Brain_SHR_F_GSM2")
    assert(r.isLeft)
    assert(r.swap.toOption.get.contains("Brain_SHR_F_GSM2"))
    assert(!java.nio.file.Files.exists(out.resolve("PRJ1_jbrowse_session.json")))
  }

  test("BWJSON_REQUIRED=false: failed samples dropped, session covers survivors") {
    val out = tempDir()
    val written = scala.collection.mutable.Map[String, String]()
    val r = RegenPipeline.regen(accList, sexResult, tpmLong, "PRJ1", out, "2026-01-01",
      writeTrack = (uname, doc) => {
        if (uname == "Brain_SHR_F_GSM2") false else { written(uname) = doc; true }
      },
      bwjsonRequired = false).toOption.get
    assert(r.failedSamples == Seq("Brain_SHR_F_GSM2"))
    assert(r.tracksWritten == Seq("Liver_BN_M_GSM1"))
    val session = new ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(r.sessionPath.get)))
      .get("session")
    assert(session.get("sessionTracks").size() == 1)
    assert(session.get("sessionTracks").get(0).get("trackId").asText()
      == "RNAseq_Liver_BN_M_GSM1")
  }

  test("invalid BioProject ID returns Left through the declared error channel") {
    val out = tempDir()
    val r = RegenPipeline.regen(accList, sexResult, tpmLong, "PRJ 1; rm -rf", out, "2026-01-01")
    assert(r == Left("ERROR: Invalid characters in BioProject ID. " +
      "Only alphanumeric, underscore, and hyphen allowed."))
    // nothing was written — validation precedes all side effects
    assert(!java.nio.file.Files.exists(out.resolve("tracks")))
  }

  test("no surviving tracks → report still written, no session (reference :383-388)") {
    val out = tempDir()
    val r = RegenPipeline.regen(accList, sexResult, tpmLong, "PRJ1", out, "2026-01-01",
      writeTrack = (_, _) => false, bwjsonRequired = false).toOption.get
    assert(r.tracksWritten.isEmpty && r.sessionPath.isEmpty)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(r.conflictReportPath)))
  }
}
