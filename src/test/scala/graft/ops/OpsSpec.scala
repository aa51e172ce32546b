package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Specs for AccListOps, ConflictReport, ProjectCombiner, ColorAssigner,
  * CoverageBins — the smaller pure-DataFrame transforms. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepFirst keeps the first in-file row per sample (O2)") {
    val acc = Seq(
      ("SRR9", "GSM1", 0L), ("SRR1", "GSM1", 1L), ("SRR5", "GSM2", 2L))
      .toDF("Run", "geo_accession", "_row_order")
    val kept = AccListOps.dedupKeepFirst(acc).collect()
      .map(r => r.getString(1) -> r.getString(0)).toMap
    assert(kept == Map("GSM1" -> "SRR9", "GSM2" -> "SRR5")) // SRR9 first in file, not min
  }

  test("groupRuns collects comma-joined runs in file order (J7)") {
    val acc = Seq(
      ("SRR9", "GSM1", 0L), ("SRR1", "GSM1", 1L), ("SRR5", "GSM2", 2L))
      .toDF("Run", "geo_accession", "_row_order")
    val runs = AccListOps.groupRuns(acc).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(runs("GSM1") == ("SRR9,SRR1", 2L))
    assert(runs("GSM2") == ("SRR5", 1L))
  }

  test("conflict report: marker pivot + inner join drops no-TPM samples (J5)") {
    val sex = Seq(("GSM1", "M", "M", "2.5", "Agree"), ("GSM2", "F", "M", "3.0", "Conflict"))
      .toDF("SampleID", "InputSex", "ComputedSex", "Ratio", "Agreement")
    val tpm = Seq(
      ("GSM1", "Xist", "812.44"), ("GSM1", "Uty", "0.00"), ("GSM1", "Actb", "999.99"))
      .toDF("sample", "gene", "tpm")
    val out = ConflictReport.build(sex, tpm).collect()
    assert(out.length == 1) // GSM2 dropped (no TPM rows) — reference :81 semantics
    val r = out.head
    assert(r.getString(0) == "GSM1" && r.getString(3) == "2.5")
    assert(r.getAs[String]("Xist") == "812.44" && r.getAs[String]("Uty") == "0.00")
    assert(r.isNullAt(r.fieldIndex("Sry"))) // marker absent from TPM table → null
  }

  test("matrix merge warns on row loss via MergeStats (J2)") {
    val a = Seq(("g1", 1.0), ("g2", 2.0)).toDF("Symbol", "s1")
    val b = Seq(("g1", 3.0)).toDF("Symbol", "s2")
    val (m, stats) = ProjectCombiner.mergeMatrices(a, b)
    assert(m.columns.toSeq == Seq("Symbol", "s1", "s2"))
    assert(stats == ProjectCombiner.MergeStats(2, 1, 1) && stats.lossy)
  }

  test("duplicate samples = intersection (J8)") {
    val a = Seq("GSM1", "GSM2").toDF("geo_accession")
    val b = Seq("GSM2", "GSM3").toDF("geo_accession")
    assert(ProjectCombiner.duplicateSamples(a, b).collect().map(_.getString(0)).toSeq
      == Seq("GSM2"))
  }

  test("color assignment: first-seen path order, palette cycling (C5)") {
    val tracks = (0 until 12).map(i => (s"t$i", s"grp${11 - i}", f"/p/${i}%02d.json"))
      .toDF("trackId", "combo_key", "_path")
    val colors = ColorAssigner.assign(tracks).collect()
      .map(r => r.getAs[String]("combo_key") -> r.getAs[String]("color")).toMap
    // first-seen order is path order: grp11 (path /p/00) gets palette(0)…
    assert(colors("grp11") == ColorAssigner.Palette(0))
    assert(colors("grp10") == ColorAssigner.Palette(1))
    assert(colors("grp1") == ColorAssigner.Palette(0))  // 11th group cycles back
    assert(colors("grp0") == ColorAssigner.Palette(1))
  }

  test("comboKey normalizes whitespace, strain-head, Unknown fallback (F8-F10)") {
    val df = Seq(
      ("Liver  lobe", "BN/NHsdMcwi, http://x", "M", " a  b "),
      ("", "", "", "")).toDF("Tissue", "Strain", "Sex", "Sample_characteristics")
    val keys = ColorAssigner.comboKey(df).collect().map(_.getAs[String]("combo_key")).toSet
    assert(keys.contains("Tissue=Liver lobe;Strain=BN/NHsdMcwi;Sex=M;SampleChar=a b"))
    assert(keys.contains("Unknown"))
  }

  test("coverage BPM: bin counts normalized per sample (A10)") {
    val reads = Seq(
      ("s1", "chr1", 5.0, 255), ("s1", "chr1", 9.0, 255),   // bin 0
      ("s1", "chr1", 12.0, 255),                            // bin 10
      ("s1", "chr2", 101.0, 255),                           // bin 100
      ("s1", "chr1", 3.0, 10))                              // below MAPQ → dropped
      .toDF("sample_id", "chrom", "pos", "mapq")
    val out = CoverageBins.bpm(reads).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out(("chr1", 0L)) == (2L, 2.0 * 1e6 / 4.0))
    assert(out(("chr1", 10L)) == (1L, 1e6 / 4.0))
    assert(out(("chr2", 100L)) == (1L, 1e6 / 4.0))
  }

  test("project classification small/large at threshold 20 (A1)") {
    val acc = (1 to 21).map(i => (s"SRR$i", s"GSM$i")).toDF("Run", "geo_accession")
    assert(AccListOps.classifyProject(acc) == (21L, "large"))
    assert(AccListOps.classifyProject(acc.limit(20)) == (20L, "small"))
  }

  test("interval overlap join: binned candidates, exactly one row per overlapping pair") {
    // chr1: 1-2 overlap (touching endpoints, closed), 3 disjoint; the 1×2 pair
    // shares MANY bins (both span several) yet must emit exactly once.
    val iv = Seq(
      ("chr1", 1L, 100L, 2500L),   // spans bins 0..8 (binSize 300)
      ("chr1", 2L, 2500L, 5000L),  // touches interval 1 at 2500 exactly
      ("chr1", 3L, 9000L, 9100L),
      ("chr2", 4L, 100L, 2500L))   // other key — never compared with chr1
      .toDF("chrom", "iid", "start", "end")
    val out = IntervalJoin.overlapPairs(iv, iv, Seq("chrom"), "iid",
      "start", "end", binSize = 300L, selfJoin = true).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("chrom") == "chr1")
    assert((row.getAs[Long]("id_a"), row.getAs[Long]("id_b")) == (1L, 2L))
  }

  test("as-of join: latest right row at-or-before each left row, null when none") {
    val trades = Seq(("A", 10L, 100L), ("A", 11L, 105L), ("B", 12L, 50L))
      .toDF("sym", "tid", "t")
    val quotes = Seq(("A", 1L, 99L), ("A", 2L, 105L), ("A", 3L, 110L), ("B", 4L, 60L))
      .toDF("sym", "qid", "t")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t",
      payloadCols = Seq("qid", "t"), payloadPrefix = "q_")
      .collect().map(r => r.getAs[Long]("tid") ->
        (Option(r.getAs[java.lang.Long]("q_qid")), Option(r.getAs[java.lang.Long]("q_t")))).toMap
    assert(out(10L) == (Some(1L), Some(99L)))   // 105/110 are in the future
    assert(out(11L) == (Some(2L), Some(105L)))  // inclusive <= at equal time
    assert(out(12L) == (None, None))            // B's only quote is later → null
  }

  test("interval overlap join two-sided: negative spans dropped, all pairs kept") {
    val a = Seq(("k", 1L, 0L, 10L), ("k", 2L, 50L, 40L)).toDF("key", "iid", "start", "end")
    val b = Seq(("k", 7L, 5L, 6L), ("k", 8L, 11L, 12L)).toDF("key", "iid", "start", "end")
    val out = IntervalJoin.overlapPairs(a, b, Seq("key"), "iid",
      "start", "end", binSize = 4L)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // interval 2 has end < start → dropped; (1,7) overlaps; (1,8) does not (closed [0,10] vs [11,12])
    assert(out == Set((1L, 7L)))
  }
}
