package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PassageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], w: Int = 3) =
    PassageDedup.removeDuplicatedPassages(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_text")))

  test("a passage shared by two documents is removed from both") {
    val shared = "all rights reserved worldwide"
    val out = run(Seq(
      1L -> s"alpha beta $shared gamma",
      2L -> s"delta $shared epsilon zeta"), w = 4)
    // shared is 4 tokens -> exactly one duplicated window in each doc
    assert(out(0) == (1L, 7L, 4L, "alpha beta gamma"))
    assert(out(1) == (2L, 7L, 4L, "delta epsilon zeta"))
  }

  test("within-document repetition is removed (both occurrences)") {
    val out = run(Seq(1L -> "x y z middle words here x y z"), w = 3)
    // "x y z" occurs twice in the same doc -> both spans covered
    assert(out(0) == (1L, 9L, 6L, "middle words here"))
  }

  test("overlapping duplicated windows cover the whole run once") {
    // "a b c d" duplicated -> windows (a b c) and (b c d) both duplicated;
    // covered positions are the union, not double-counted
    val out = run(Seq(1L -> "a b c d tail one", 2L -> "head a b c d two"), w = 3)
    assert(out(0) == (1L, 6L, 4L, "tail one"))
    assert(out(1) == (2L, 6L, 4L, "head two"))
  }

  test("documents shorter than the window and unique docs pass through") {
    val out = run(Seq(1L -> "tiny doc", 2L -> "completely unique tokens only here"), w = 3)
    assert(out(0) == (1L, 2L, 0L, "tiny doc"))
    assert(out(1) == (2L, 5L, 0L, "completely unique tokens only here"))
  }

  test("a fully-duplicated document cleans to the empty string") {
    val out = run(Seq(1L -> "same three words", 2L -> "same three words"), w = 3)
    assert(out(0) == (1L, 3L, 3L, ""))
    assert(out(1) == (2L, 3L, 3L, ""))
  }

  test("tokenization is case-insensitive and whitespace-normalized") {
    val out = run(Seq(1L -> "Boiler Plate Text unique1", 2L -> "boiler  plate   text unique2"), w = 3)
    assert(out(0)._4 == "unique1")
    assert(out(1)._4 == "unique2")
  }
}
