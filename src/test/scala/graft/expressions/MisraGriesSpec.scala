package graft.expressions

import graft.SparkSpec
import graft.expressions.MisraGries.misraGries
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch retains every item above N/k across partitions and serialization") {
    // 1000 rows: "hot" ×400, "warm" ×200, tail of 400 singletons; k=8 → N/k=125.
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (1 to 400).map(i => s"tail$i")
    val df = rows.toDF("t").repartition(7) // force partial buffers + merge path
    val m = df.agg(misraGries(col("t"), 8)).head().getMap[String, Long](0)
    assert(m.contains("hot") && m.contains("warm")) // guaranteed superset
    assert(m.size <= 8)
    // weights under-estimate but never exceed the true counts
    assert(m("hot") <= 400L && m("warm") <= 200L)
  }

  test("heavyGrams equals the exact groupBy formulation (phi > 1/k)") {
    val docs = (
      Seq.fill(30)("spark spark") ++      // bigram "spark spark" ×30
      Seq.fill(10)("scala scala") ++      // ×10
      (1 to 60).map(i => s"a$i b$i")      // 60 distinct singleton bigrams
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = HeavyHitters.heavyGrams(docs, "text", n = 2, phi = 0.2, k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // total 100 bigrams, threshold ceil(20) = 20 → only "spark spark"
    assert(out == Map("spark spark" -> 30L))
  }

  test("heavyGrams two-level merge: any fanin gives the single-merge answer") {
    val docs = (
      Seq.fill(30)("spark spark") ++
      Seq.fill(10)("scala scala") ++
      (1 to 60).map(i => s"a$i b$i")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .repartition(16) // more partitions than fanin=4, fewer than fanin=64
    def run(fanin: Int) =
      HeavyHitters.heavyGrams(docs, "text", n = 2, phi = 0.2, k = 16, fanin = fanin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = run(1)
    assert(single == Map("spark spark" -> 30L))
    assert(run(4) == single)   // partitions pre-merge into 4 groups
    assert(run(64) == single)  // fanin beyond partition count degenerates safely
  }

  test("heavyGrams rejects phi <= 1/k (guarantee would not hold)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyGrams(docs, "text", n = 2, phi = 0.001, k = 100)
    }
  }
}
