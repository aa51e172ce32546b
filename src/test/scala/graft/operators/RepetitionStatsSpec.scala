package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: (Long, String)*) =
    RepetitionStats.withRepetitionSignals(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("duplicate line/paragraph fractions: hand-checked counts and characters") {
    // \n-split sees the \n\n as an EMPTY line: ["aa bb","aa bb","","cc dd e",
    // "f"] -> 1 duplicate of 5; dup chars 5 of 5+5+0+7+1=18. Paragraphs:
    // ["aa bb\naa bb", "cc dd e\nf"] both unique -> 0.
    val m = signals((1L, "aa bb\naa bb\n\ncc dd e\nf"))
    val r = m(1L)
    assert(r.getAs[Double]("dup_line_frac") === 0.2)
    assert(r.getAs[Double]("dup_line_char_frac") === 5.0 / 18.0)
    assert(r.getAs[Double]("dup_para_frac") === 0.0)
    assert(r.getAs[Double]("dup_para_char_frac") === 0.0)
    // the SAME paragraph twice -> 1 of 3 duplicate, chars 5 of 5+5+2=12
    val p = signals((2L, "aa bb\n\naa bb\n\nzz"))(2L)
    assert(p.getAs[Double]("dup_para_frac") === 1.0 / 3.0)
    assert(p.getAs[Double]("dup_para_char_frac") === 5.0 / 12.0)
  }

  test("overlapping occurrences of the top gram cover positions ONCE") {
    // "a a a a a": top 2-gram "a a" starts at 1..4 (4 occurrences); exact
    // position coverage = all 5 tokens = fraction 1.0, not 8/5.
    val r = signals((1L, "a a a a a"))(1L)
    assert(r.getAs[Double]("top_gram_char_frac") === 1.0)
    // and the duplicated-5-gram signal: only one 5-gram -> no duplicate
    assert(r.getAs[Double]("dup_gram_char_frac") === 0.0)
  }

  test("duplicated 5-gram coverage marks exactly the covered tokens") {
    // v w x y z appears twice (10 covered single-char tokens), m1..m4 never
    // duplicated. covered chars 10 of 10 + 8 (m1..m4 are 2 chars each) = 18.
    val r = signals((1L, "v w x y z m1 m2 m3 m4 v w x y z"))(1L)
    assert(r.getAs[Double]("dup_gram_char_frac") === 10.0 / 18.0)
  }

  test("topGramValue tie-break: count desc then lexicographically smallest") {
    val df = Seq(Tuple1(Seq("b c", "a b", "b c", "a b"))).toDF("g")
    val v = df.select(RepetitionStats.topGramValue(col("g"))).as[String].collect()(0)
    assert(v === "a b")
  }

  test("degenerate inputs: single-token and empty docs score zero everywhere") {
    val m = signals((1L, "word"), (2L, ""))
    for (id <- Seq(1L, 2L); c <- Seq("dup_line_frac", "dup_line_char_frac",
        "dup_para_frac", "dup_para_char_frac", "top_gram_char_frac",
        "dup_gram_char_frac"))
      assert(m(id).getAs[Double](c) === 0.0, s"doc $id column $c")
  }

  test("fused native signals ≡ the HOF reference chain, bit for bit") {
    val docs = Seq(
      (1L, "aa bb\naa bb\n\ncc dd e\nf"),
      (2L, "a a a a a"),
      (3L, "v w x y z m1 m2 m3 m4 v w x y z"),
      (4L, ""), (5L, "word"),
      (6L, "  leading  spaces\tand\ttabs\nmixed  trailing  "),
      (7L, "Ünïcode Ünïcode grüße GRÜSSE\nÜnïcode Ünïcode"),
      (8L, "x y x y x y x y\n\nx y x y\n\nx y"),
      (9L, "b c a b b c a b"), // top-gram tie → lexicographically smallest
      (10L, null.asInstanceOf[String]),
      (11L, "one two three four five six seven one two three four five six"),
      (12L, "\n\n\n"), (13L, "a\n\na\n\na"),
      (14L, (1 to 30).map(i => s"line ${i % 3}").mkString("\n")))
      .toDF("doc_id", "text")
    val cols = Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
      "dup_para_char_frac", "top_gram_char_frac", "dup_gram_char_frac")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id") +: cols.map(col): _*).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
    assert(rows(RepetitionStats.withRepetitionSignals(docs))
      === rows(RepetitionStats.withRepetitionSignalsHof(docs)))
    // non-default gram sizes exercise the coverage window arithmetic
    assert(rows(RepetitionStats.withRepetitionSignals(docs, "text", topN = 3, dupN = 4))
      === rows(RepetitionStats.withRepetitionSignalsHof(docs, "text", topN = 3, dupN = 4)))
  }

  test("fused ≡ HOF on a seeded random corpus (unicode, whitespace runs, planted repeats)") {
    val rnd = new scala.util.Random(4215)
    val words = Seq("alpha", "Beta", "GAMMA", "δéλτα", "ε", "ζη", "θ",
      "grüße", "Ünïcode", "x1", "22", "a-b", "...", "日本", "'s")
    val seps = Seq(" ", "  ", "\t", " \t ", "\n", "\n\n", " \n ", " ")
    def doc(): String = {
      val sb = new StringBuilder
      val phrase = (1 to (1 + rnd.nextInt(3)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (0 until (2 + rnd.nextInt(40))).foreach { _ =>
        // planted repetition: re-emit the phrase ~1/4 of the time
        sb.append(if (rnd.nextInt(4) == 0) phrase
          else words(rnd.nextInt(words.length)))
        sb.append(seps(rnd.nextInt(seps.length)))
      }
      sb.toString
    }
    val docs = (1L to 120L).map(i => (i, doc())).toDF("doc_id", "text")
    val cols = Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac",
      "dup_para_char_frac", "top_gram_char_frac", "dup_gram_char_frac")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id") +: cols.map(col): _*).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
    for ((topN, dupN) <- Seq((2, 5), (3, 4), (1, 2)))
      assert(rows(RepetitionStats.withRepetitionSignals(docs, "text", topN, dupN))
        === rows(RepetitionStats.withRepetitionSignalsHof(docs, "text", topN, dupN)),
        s"fused diverged from the HOF reference at topN=$topN dupN=$dupN")
  }

  test("repetitionFilter keeps clean docs, drops spam, preserves schema") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "buy now buy now buy now buy now buy now buy now")).toDF("doc_id", "text")
    val kept = RepetitionStats.repetitionFilter(docs)
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("curate's repetitionGate drops repetition spam the quality gate passes") {
    val docs = Seq(
      (1L, "the cat and the dog walked to the park with a friend"),
      (2L, "the spam and the spam and the spam and the spam and the spam"))
      .toDF("doc_id", "text")
    val open = CurationPipeline.curate(docs, minQuality = 0.0)
    val gated = CurationPipeline.curate(docs, minQuality = 0.0,
      repetitionGate = Some(RepetitionStats.RepetitionThresholds()))
    assert(open.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    assert(gated.select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("signals append to the row without disturbing original columns") {
    val out = RepetitionStats.withRepetitionSignals(
      Seq((7L, "x y x y", "keep")).toDF("doc_id", "text", "extra"))
    assert(out.columns.take(3).toSeq === Seq("doc_id", "text", "extra"))
    assert(out.select("extra").as[String].collect()(0) === "keep")
  }
}
