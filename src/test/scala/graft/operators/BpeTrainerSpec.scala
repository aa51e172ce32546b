package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts are weighted by pre-token frequency") {
    // "ab ab ab cd" -> pre-tokens: "ab", " ab"×2, " cd"
    val docs = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val out = BpeTrainer.topPairs(docs, "text", 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("ab") === 3L)   // from "ab" ×1 and " ab" ×2 (pair at offset 2)
    assert(out(" a") === 2L)   // leading-space pairs of " ab"
    assert(out("cd") === 1L)
  }

  test("single-char pre-tokens contribute no pairs") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // pre-tokens "a", " b", " c": only " b"/" c" have length 2
    val out = BpeTrainer.topPairs(docs, "text", 10).collect()
      .map(r => r.getString(0)).toSet
    assert(out === Set(" b", " c"))
  }

  test("ranking is (count desc, pair asc) with a hard k cap") {
    val docs = Seq((1L, "xy xy zz zz aa")).toDF("doc_id", "text")
    val out = BpeTrainer.topPairs(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length === 3)
    assert(out.map(_._2).sorted.reverse.toSeq === out.map(_._2).toSeq) // desc
    // " x"," z" both appear; ties broken lexicographically
    val tied = out.filter(_._2 == out.head._2).map(_._1)
    assert(tied.sorted.toSeq === tied.toSeq)
  }

  test("frequency table is reusable and vocabulary-sized") {
    val docs = Seq((1L, "the the the cat"), (2L, "the cat")).toDF("doc_id", "text")
    val freq = BpeTrainer.preTokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("the") === 2L)  // doc-initial "the" twice
    assert(freq(" the") === 2L)
    assert(freq(" cat") === 2L)
  }
}
