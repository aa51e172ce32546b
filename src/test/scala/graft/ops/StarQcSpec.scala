package graft.ops

import graft.SparkSpec
import graft.io.TsvSources

class StarQcSpec extends SparkSpec {
  import spark.implicits._

  private def starLog(input: String, mm: String, short: String, other: String): String =
    s"""                          Started job on |	Apr 01 10:00:00
       |                      Number of input reads |	$input
       |                   Uniquely mapped reads % |	80.00%
       | Number of reads unmapped: too many mismatches |	$mm
       |      Number of reads unmapped: too short |	$short
       |           Number of reads unmapped: other |	$other
       |""".stripMargin

  test("parses STAR logs, computes 2dp rate, gates PASS/FAIL at <50 on the rounded value") {
    // pSTARQC_v1.sh:90-94 — 24,776,293 reads, 1,200,345 unmapped → 4.84% PASS
    val pass = fixture("GSM1_STARLog.final.out", starLog("24,776,293", "0", "1,200,345", "0"))
    val fail = fixture("GSM2_STARLog.final.out", starLog("100", "30", "30", "0")) // 60% FAIL
    val kv = TsvSources.readStarLogs(spark, pass, fail)
    val samples = Seq("GSM1", "GSM2", "GSM3").toDF("SampleID")

    val out = StarQc.summarize(kv, samples).collect().map(r =>
      r.getString(0) -> r).toMap
    assert(out("GSM1").getString(4) == "PASS")
    assert(out("GSM1").getLong(1) == 24776293L)
    assert(out("GSM1").getLong(2) == 1200345L)
    assert(out("GSM1").getDouble(3) == 4.84)
    assert(out("GSM2").getString(4) == "FAIL")
    assert(out("GSM2").getDouble(3) == 60.0)
    // no log at all → NO_LOG with null numerics (pSTARQC_v1.sh:73-74)
    assert(out("GSM3").getString(4) == "NO_LOG")
    assert(out("GSM3").isNullAt(1) && out("GSM3").isNullAt(3))
  }

  test("exactly-50% rounds to 50.00 and FAILs; 49.995 rounds to 50.00 and FAILs too") {
    // the gate compares the *rounded* value (printf %.2f then p<50.0)
    val l1 = fixture("GSMa_STARLog.final.out", starLog("200000", "99990", "0", "0")) // 49.995→50.00
    val kv = TsvSources.readStarLogs(spark, l1)
    val out = StarQc.summarize(kv, Seq("GSMa").toDF("SampleID")).collect().head
    assert(out.getDouble(3) == 50.0)
    assert(out.getString(4) == "FAIL")
  }

  test("zero or missing input reads → INVALID_LOG (pSTARQC_v1.sh:85-88)") {
    val z = fixture("GSMz_STARLog.final.out", starLog("0", "1", "1", "1"))
    val m = fixture("GSMm_STARLog.final.out", "          Started job on |\tApr 01\n")
    val kv = TsvSources.readStarLogs(spark, z, m)
    val out = StarQc.summarize(kv, Seq("GSMz", "GSMm").toDF("SampleID"))
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(out("GSMz") == "INVALID_LOG")
    assert(out("GSMm") == "INVALID_LOG")
  }

  test("duplicate key lines: first in-file occurrence wins (awk exit, pSTARQC_v1.sh:50-61)") {
    val log = fixture("GSMd_STARLog.final.out",
      "   Number of input reads |\t1000\n" +
        "   Number of input reads |\t9999\n" +
        "   Number of reads unmapped: too short |\t100\n" +
        "   Number of reads unmapped: too short |\t500\n")
    val kv = TsvSources.readStarLogs(spark, log)
    val out = StarQc.summarize(kv, Seq("GSMd").toDF("SampleID")).collect().head
    assert(out.getLong(1) == 1000L)   // not 9999: min_by(_line_order), not first()
    assert(out.getLong(2) == 100L)
    assert(out.getDouble(3) == 10.0)
  }

  test("passFilter keeps only PASS samples, preserving AccList columns (J1)") {
    val acc = Seq(("SRR1", "GSM1"), ("SRR2", "GSM2"), ("SRR3", "GSM1"))
      .toDF("Run", "geo_accession")
    val qc = Seq(("GSM1", "PASS"), ("GSM2", "FAIL")).toDF("SampleID", "Status")
    val kept = StarQc.passFilter(acc, qc).collect()
    assert(kept.map(_.getAs[String]("Run")).sorted.toSeq == Seq("SRR1", "SRR3"))
    assert(kept.forall(_.getAs[String]("geo_accession") == "GSM1"))
  }
}
