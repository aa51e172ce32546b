package graft.io

import graft.SparkSpec

class TsvSourcesSpec extends SparkSpec {

  test("AccList reader: header, #-comments, blank lines, CRLF, in-file order (S1/P13)") {
    val acc = fixture("AccList.txt",
      "Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\tTitle\tSample_characteristics\tStrainInfo\n" +
        "SRR1\tGSM1\tLiver\tBN/NHsdMcwi\tM\t1\tu\tT1\tage: 12 weeks; treatment: control\tsi\r\n" +
        "# a comment line\n" +
        "\n" +
        "SRR2\tGSM2\tBrain\tSHR\tF\t2\tu\tT2\tchars\tsi\n" +
        "SRR3\tGSM1\tLiver\tBN/NHsdMcwi\tM\t1\tu\tT1\tchars\tsi\n")
    val df = TsvSources.readAccList(spark, acc)
    val rows = df.orderBy("_row_order").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).toSeq == Seq("SRR1", "SRR2", "SRR3"))
    assert(rows.head.getString(4) == "M")          // CRLF stripped from last col path
    assert(rows.head.getString(9) == "si")
    assert(df.columns.take(10).toSeq == graft.model.Schemas.accListColumns)
  }

  test("multi-file AccList glob: keep-first dedup is deterministic in sorted-path order (O2)") {
    val dir = tempDir()
    val header = "Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\tTitle\tSample_characteristics\tStrainInfo\n"
    java.nio.file.Files.writeString(dir.resolve("a_AccList.txt"),
      header + "SRR10\tGSM1\tLiver\tBN\tM\t1\tu\tT\tc\ts\n")
    java.nio.file.Files.writeString(dir.resolve("b_AccList.txt"),
      header + "SRR20\tGSM1\tBrain\tSHR\tF\t2\tu\tT\tc\ts\n" +
        "SRR21\tGSM2\tBrain\tSHR\tF\t2\tu\tT\tc\ts\n")
    val df = TsvSources.readAccList(spark, dir.toString + "/*_AccList.txt")
    // _row_order = (source path, in-file id): file a precedes file b regardless of
    // which Spark partition read it first
    val kept = graft.ops.AccListOps.dedupKeepFirst(df).collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(kept == Map("GSM1" -> "SRR10", "GSM2" -> "SRR21"))
  }

  test("project-list reader: whitespace split, default readlen 150 (S2)") {
    val pl = fixture("projects.txt",
      "# comment\n/path/a.txt  PRJ1  100\n/path/b.txt PRJ2\n\n")
    val rows = TsvSources.readProjectList(spark, pl).orderBy("project").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "PRJ1" && rows(0).getInt(2) == 100)
    assert(rows(1).getString(1) == "PRJ2" && rows(1).getInt(2) == 150)
  }

  test("RSEM reader: header skip, typed casts, sample/source derivation (S5/F5/F6)") {
    val r = fixture("GSM7.genes.results",
      "gene_id\ttranscript_id(s)\tlength\teffective_length\texpected_count\tTPM\tFPKM\n" +
        "Xist\tNR_1\t17814.00\t17650.12\t2543.00\t812.44\t650.11\n" +
        "Uty\tNM_1\t5112.00\t4948.12\t0.00\t0.00\t0.00\n")
    val df = TsvSources.readRsemResults(spark, Seq(r))
    val rows = df.orderBy("gene_id").collect()
    assert(rows.length == 2)
    val xist = rows.find(_.getString(0) == "Xist").get
    assert(xist.getAs[String]("TPM") == "812.44")        // raw text preserved
    assert(xist.getAs[Double]("TPM_d") == 812.44)
    assert(xist.getAs[String]("source_file") == "GSM7.genes.results")
    assert(xist.getAs[String]("sample") == "GSM7")
  }

  test("idxstats reader derives sample id from file name (S4)") {
    val f = fixture("GSM9_idxstats.txt",
      "chrX\t159970021\t4500000\t12000\nchrY\t18315841\t2500\t40\n")
    val rows = TsvSources.readIdxStats(spark, f).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("sample_id") == "GSM9"))
    assert(rows.find(_.getString(0) == "chrY").get.getAs[Long]("mapped") == 2500L)
  }

  test("FastQC summary reader: CRLF triples, sample from file column, blank lines dropped (S16)") {
    val f = fixture("summary.txt",
      "PASS\tBasic Statistics\tSRR1_1.fastq.gz\r\n" +
        "WARN\tPer base sequence quality\tSRR1_1.fastq.gz\r\n" +
        "\r\n" + // blank line tolerated
        "FAIL\tAdapter Content\tSRR1_1.fastq.gz\r\n")
    val rows = TsvSources.readQcSummaries(spark, f).orderBy("module").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("status")).toSeq == Seq("FAIL", "PASS", "WARN"))
    assert(rows.forall(_.getAs[String]("sample") == "SRR1_1")) // extensions stripped
    assert(rows.forall(_.getAs[String]("module").last != '\r')) // CRLF really gone
  }

  test("QC pivot: sample × module matrix with explicit module list; counts + triage (S16)") {
    import graft.ops.QcSummary
    import spark.implicits._
    val qc = Seq(
      ("s1", "Basic Statistics", "PASS"), ("s1", "Adapter Content", "FAIL"),
      ("s2", "Basic Statistics", "WARN")).toDF("sample", "module", "status")
    val m = QcSummary.pivotStatuses(qc, Seq("Basic Statistics", "Adapter Content"))
      .orderBy("sample").collect()
    assert(m(0).getAs[String]("Basic Statistics") == "PASS")
    assert(m(0).getAs[String]("Adapter Content") == "FAIL")
    assert(m(1).getAs[String]("Basic Statistics") == "WARN")
    assert(m(1).getAs[String]("Adapter Content") == null) // absent module stays null
    val counts = QcSummary.statusCounts(qc).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts(("Basic Statistics", "PASS")) == 1L)
    assert(counts(("Basic Statistics", "WARN")) == 1L)
    val failing = QcSummary.failingSamples(qc).collect().map(r => (r.getString(0), r.getString(1)))
    assert(failing.toSeq == Seq(("s1", "Adapter Content")))
  }

  test("QC pivot: duplicate (sample, module) rows resolve to the WORST status") {
    import graft.ops.QcSummary
    import spark.implicits._
    // severity FAIL > WARN > PASS — lexicographic min would wrongly report
    // PASS over WARN ("PASS" < "WARN") and FAIL over everything by accident
    val qc = Seq(
      ("s1", "Basic Statistics", "PASS"), ("s1", "Basic Statistics", "WARN"),
      ("s2", "Basic Statistics", "WARN"), ("s2", "Basic Statistics", "FAIL"),
      ("s3", "Basic Statistics", "PASS"), ("s3", "Basic Statistics", "PASS"))
      .toDF("sample", "module", "status")
    val m = QcSummary.pivotStatuses(qc, Seq("Basic Statistics"))
      .orderBy("sample").collect()
    assert(m(0).getAs[String]("Basic Statistics") == "WARN")
    assert(m(1).getAs[String]("Basic Statistics") == "FAIL")
    assert(m(2).getAs[String]("Basic Statistics") == "PASS")
  }
}
