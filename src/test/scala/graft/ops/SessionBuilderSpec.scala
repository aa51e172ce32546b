package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionBuilderSpec extends SparkSpec {
  import spark.implicits._

  private val acc = Seq(
    ("SRR1", "GSM1", "Liver", "BN/NHsdMcwi", "M", "123", "http://geo", "Title A",
      "age: 12 weeks; treatment: \"control\"", "http://rgd"))
    .toDF("Run", "geo_accession", "Tissue", "Strain", "Sex", "PMID", "GEOpath",
      "Title", "Sample_characteristics", "StrainInfo")

  test("per-sample track JSON: structure, escaping, Unknown sex default (C6/F4/J4)") {
    val df = AccListOps.withUniqueName(acc)
      .withColumn("ComputedSex", lit(null).cast("string"))
      .select(SessionBuilder.trackJson("PRJNA1").as("doc"))
    val json = df.head().getString(0)
    val node = new ObjectMapper().readTree(json) // C7: parse-back fail-fast
    assert(node.get("type").asText() == "FeatureTrack")
    assert(node.get("trackId").asText() == "RNAseq_Liver_BN/NHsdMcwi_M_GSM1")
    assert(node.get("metadata").get("Computed Sex").asText() == "Unknown")
    assert(node.get("metadata").get("Sample Characteristic").asText()
      == "age: 12 weeks; treatment: \"control\"") // quotes escaped in transit
    assert(node.get("metadata").get("PubMed ID").asText() == "PMID:123")
    assert(node.get("adapter").get("bigWigLocation").get("uri").asText()
      == "RNAseq_Liver_BN/NHsdMcwi_M_GSM1.bigwig")
    assert(node.get("displays").get(0).get("displayId").asText()
      == "RNAseq_Liver_BN/NHsdMcwi_M_GSM1-LinearWiggleDisplay")
  }

  test("session doc: gene track first, colors by first-seen group, viewport math") {
    val tracks = Seq(
      ("t_b", "grpB", "/p/2.json"), ("t_a", "grpA", "/p/1.json"), ("t_c", "grpA", "/p/3.json"))
      .toDF("trackId", "combo_key", "_path")
    val json = SessionBuilder.buildSession(tracks, "PRJNA1", "2026-01-01T00:00:00")
    val root = new ObjectMapper().readTree(json).get("session")
    assert(root.get("name").asText() == "PRJNA1_RNAseq_expression")
    val view = root.get("views").get(0)
    val vt = view.get("tracks")
    assert(vt.get(0).get("type").asText() == "FeatureTrack") // gene track injected first
    assert(vt.get(1).get("configuration").asText() == "t_a") // path-sorted after
    // first-seen: grpA (path /p/1) → palette(0); grpB → palette(1)
    val colorOf = (i: Int) => vt.get(i).get("displays").get(0).get("color").asText()
    assert(colorOf(1) == ColorAssigner.Palette(0))
    assert(colorOf(2) == ColorAssigner.Palette(1))  // t_b
    assert(colorOf(3) == ColorAssigner.Palette(0))  // t_c shares grpA color
    // viewport math: bpPerPx = window/2000, offset = (start-1)/bpPerPx (F12)
    val bp = view.get("bpPerPx").asDouble()
    assert(math.abs(bp - (14497135 - 12315273 + 1) / 2000.0) < 1e-9)
    assert(math.abs(view.get("offsetPx").asDouble() - 12315272 / bp) < 1e-9)
    val st = root.get("sessionTracks")
    assert(st.size() == 3)
    assert(st.get(0).get("type").asText() == "QuantitativeTrack")
    assert(st.get(0).get("adapter").get("bigWigLocation").get("uri").asText()
      .startsWith("https://download.rgd.mcw.edu/expression/PRJNA1/"))
  }
}
