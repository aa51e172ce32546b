package graft.operators

import graft.SparkSpec

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference of the md5 mask decision — byte-for-byte the operator's
    * construction. */
  private def maskedRef(docId: Long, pos: Int, pct: Int): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId:$pos".getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 100 < pct
  }

  test("corruption matches a local reference reconstruction exactly") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val docs = Seq((7L, text.trim), (42L, text.trim)).toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(docs, "doc_id", "text", maskPercent = 30)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = text.trim.toLowerCase.split("\\s+")
      val m = toks.indices.map(i => maskedRef(id, i + 1, 30))
      val expectedCorrupted = toks.indices.flatMap { i =>
        if (!m(i)) Some(toks(i))
        else if (i == 0 || !m(i - 1)) Some("<mask>")
        else None
      }.mkString(" ")
      val spans = toks.indices.count(i => m(i) && (i == 0 || !m(i - 1)))
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === m.count(identity).toLong)
      assert(r.getLong(3) === spans.toLong)
      assert(r.getString(4) === expectedCorrupted)
    }
  }

  test("maskPercent 0 is the identity; 100 collapses the doc to one sentinel") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val zero = SpanCorruption.corrupt(docs, "doc_id", "text", 0).collect()(0)
    assert(zero.getString(4) === "a b c d e" && zero.getLong(3) === 0L)
    val full = SpanCorruption.corrupt(docs, "doc_id", "text", 100).collect()(0)
    assert(full.getString(4) === "<mask>" && full.getLong(3) === 1L
      && full.getLong(2) === 5L)
  }

  test("zero shuffle: corruption is scan-side") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = SpanCorruption.corrupt(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"plan:\n$plan")
  }
}
