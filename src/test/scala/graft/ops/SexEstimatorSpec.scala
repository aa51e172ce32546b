package graft.ops

import graft.SparkSpec

class SexEstimatorSpec extends SparkSpec {
  import spark.implicits._

  private def idx(sample: String, xMap: Long, xLen: Long, yMap: Long, yLen: Long) =
    Seq(
      (sample, "chrX", xLen, xMap, 0L),
      (sample, "chrY", yLen, yMap, 0L),
      (sample, "NW_004955401.1", 100000L, 10L, 0L)) // scaffold rows ignored by X/Y lookup

  private def run(rows: Seq[(String, String, Long, Long, Long)],
                  meta: Seq[(String, String)]) = {
    val idxDf = rows.toDF("sample_id", "contig", "length", "mapped", "unmapped")
    val metaDf = meta.toDF("SampleID", "InputSex")
    SexEstimator.estimate(idxDf, metaDf).collect()
      .map(r => r.getString(0) -> r).toMap
  }

  test("yCov == 0 → Ratio literal 'Inf', sex F (ComputeSex_v5.sh:120-122)") {
    val out = run(idx("S1", 4500000, 159970021, 0, 18315841), Seq("S1" -> "F"))
    val r = out("S1")
    assert(r.getString(2) == "F")
    assert(r.getString(3) == "Inf")
    assert(r.getString(4) == "Agree")
    assert(r.isNullAt(5))
  }

  test("ratio > 40 → F, ratio <= 40 → M; boundary ratio exactly 40 is M") {
    // x_cov = 800/100 = 8.000000, y_cov = 20/100 = 0.200000 → ratio 40.000000 → M
    val atBoundary = run(idx("S1", 800, 100, 20, 100), Seq("S1" -> "M"))
    assert(atBoundary("S1").getString(2) == "M")
    assert(atBoundary("S1").getString(3) == "40.000000")
    // x_cov 8.000001-ish: 8000001/1e6 over 0.2 → 40.000005 → F
    val above = run(idx("S2", 8000001, 1000000, 200000, 1000000), Seq("S2" -> "F"))
    assert(above("S2").getString(2) == "F")
    assert(above("S2").getString(3) == "40.000005")
  }

  test("bc-style truncation (not rounding) at scale 6") {
    // x_cov = 2/30000 = 0.000066 truncated (rounding would give 0.000067);
    // y_cov = 1/1 = 1.000000 → ratio prints .000066 (bc no-leading-zero style)
    val out = run(idx("S1", 2, 30000, 1, 1), Seq("S1" -> "M"))
    assert(out("S1").getString(3) == ".000066")
    assert(out("S1").getString(2) == "M")
    // and 2/3 over 1/3: both truncate to .666666/.333333, dividing EXACTLY to 2
    val exact = run(idx("S2", 2, 3, 1, 3), Seq("S2" -> "M"))
    assert(exact("S2").getString(3) == "2.000000")
  }

  test("sub-1 ratios print bc-style without leading zero") {
    // x_cov = 1/10 = .100000, y_cov = 1/2 = .500000 → ratio .200000
    val out = run(idx("S1", 1, 10, 1, 2), Seq("S1" -> "M"))
    assert(out("S1").getString(3) == ".200000")
  }

  test("agreement: metadata vs computed (ComputeSex_v5.sh:133-138)") {
    val out = run(
      idx("S1", 4500000, 159970021, 0, 18315841) ++ idx("S2", 800, 100, 100, 100),
      Seq("S1" -> "M", "S2" -> "M"))
    assert(out("S1").getString(4) == "Conflict") // computed F vs input M
    assert(out("S2").getString(4) == "Agree")    // ratio 8 → M
  }
}
