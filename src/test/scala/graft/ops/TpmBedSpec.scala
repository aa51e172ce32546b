package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class TpmBedSpec extends SparkSpec {
  import spark.implicits._

  test("rgbBucket thresholds incl. boundaries (GeneTPMbed_v2.sh:53-63)") {
    val vals = Seq(0.0, 0.5, 0.51, 10.0, 10.01, 1000.0, 1000.01).toDF("tpm")
    val got = vals.select(col("tpm"), TpmBed.rgbBucket(col("tpm")).as("rgb"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(0.0) == "128,128,128" && got(0.5) == "128,128,128")
    assert(got(0.51) == "173,216,230" && got(10.0) == "173,216,230")
    assert(got(10.01) == "0,0,205" && got(1000.0) == "0,0,205")
    assert(got(1000.01) == "0,0,139")
  }

  test("build: name join, chr/NW_ filters, '0.00' string filter, BED9 shape, position sort") {
    val bed = Seq(
      ("chr2", 200L, 300L, "GeneB"),
      ("chr1", 100L, 200L, "GeneA"),
      ("NW_004955401.1", 1L, 2L, "GeneA"),   // scaffold dropped
      ("chr1", 50L, 80L, "GeneC"),           // zero-TPM dropped
      ("chr3", 10L, 20L, "GeneD"))           // no TPM row → inner join drops
      .toDF("chrom", "start", "end", "name")
    val tpm = Seq(("GeneA", "812.44"), ("GeneB", "0.000"), ("GeneC", "0.00"))
      .toDF("gene_id", "TPM")
    val rows = TpmBed.build(bed, tpm).collect()
    // "0.000" survives the string compare — bug-for-bug with $5 != "0.00"
    assert(rows.map(_.getString(3)).toSeq == Seq("GeneA", "GeneB"))
    val a = rows.head
    assert(a.getString(0) == "chr1" && a.getLong(1) == 100L && a.getLong(2) == 200L)
    assert(a.getString(4) == "812.44")                    // score = raw TPM text
    assert(a.getString(5) == ".")
    assert(a.getLong(6) == 100L && a.getLong(7) == 200L)  // thickStart/End
    assert(a.getString(8) == "0,0,205")                   // 812.44 → medium blue
  }
}
