package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def probsOf(pairs: (String, Double)*) = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  test("viterbi picks the maximum-likelihood segmentation") {
    val m = probsOf("ab" -> 0.4, "a" -> 0.2, "b" -> 0.2, "c" -> 0.2)
    assert(UnigramLm.viterbi("abc", m, 4) === Seq("ab", "c"))
    assert(UnigramLm.viterbi("abab", m, 4) === Seq("ab", "ab"))
    // single path
    assert(UnigramLm.viterbi("cc", m, 4) === Seq("c", "c"))
  }

  test("viterbi ties break to the longer piece") {
    // "ab" direct = 0.25; "a"·"b" = 0.5·0.5 = 0.25 — an EXACT double tie;
    // the longer last piece must win (the replay's ORDER BY val DESC, l DESC)
    val m = probsOf("ab" -> 0.25, "a" -> 0.5, "b" -> 0.5)
    assert(UnigramLm.viterbi("ab", m, 4) === Seq("ab"))
  }

  test("viterbi: unreachable interior positions route through longer pieces; unreachable end drops the word") {
    // no "b" single: position after 'a' unreachable alone, but "bc" spans it
    val m = probsOf("a" -> 0.4, "bc" -> 0.4, "c" -> 0.2)
    assert(UnigramLm.viterbi("abc", m, 4) === Seq("a", "bc"))
    // 'z' nowhere in the map: the whole word is unsegmentable → empty
    assert(UnigramLm.viterbi("az", m, 4) === Seq.empty)
  }

  test("seedVocab: substring counts weighted by word frequency; singles always kept") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // pre-tokens: "ab", " ab", " cd" — each freq 1
    val seeds = UnigramLm.seedVocab(docs, "text", maxPieceLen = 4, vocabSize = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seeds("ab") === 2L, "substring of both 'ab' and ' ab'")
    assert(seeds(" ab") === 1L)
    // singles survive regardless of the multi-char top-k cut
    for (ch <- Seq("a", "b", "c", "d", " ")) assert(seeds.contains(ch), s"single '$ch'")
  }

  test("training drives probability mass onto the repeated unit; encode round-trips the text") {
    val docs = Seq(
      (1L, "abababab abababab"),
      (2L, "abababab cd"),
      (3L, "abababab abababab abababab")).toDF("doc_id", "text")
    val model = UnigramLm.trainUnigram(docs, "text", maxPieceLen = 4,
      vocabSize = 20, iters = 2)
    val counts = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ > 0L), "final model keeps positive counts only")
    assert(counts.contains("abab"), s"the dominant 4-gram must survive, got $counts")
    val enc = UnigramLm.encodeUnigram(docs, "doc_id", "text", model, maxPieceLen = 4)
    // segmentation is LOSSLESS: pre-tokens tile the text, pieces tile each
    // pre-token, so rejoining the tokens in order reproduces every document
    val joined = enc.groupBy(col("doc_id"))
      .agg(concat_ws("", collect_list(col("token"))).as("t"))
    // collect_list order is the explode order within one partition-local doc
    val back = enc.orderBy(col("doc_id"), col("pos"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).mkString).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back === orig, "token concatenation must reproduce the documents")
    assert(joined.count() === 3)
  }

  test("encodeUnigramToIds prices the exact q171 segmentation through vocabIds") {
    val docs = Seq((1L, "abab abab cd"), (2L, "abab cd cd")).toDF("doc_id", "text")
    val model = UnigramLm.trainUnigram(docs, "text", maxPieceLen = 4,
      vocabSize = 10, iters = 2)
    val ids = UnigramLm.vocabIds(model).collect()
      .map(r => r.getInt(1) -> r.getString(0)).toMap
    assert(ids.keys.toSeq.sorted === (0 until ids.size), "dense 0-based ids")
    // ids sort ascending by piece in binary order
    assert(ids.toSeq.sortBy(_._1).map(_._2) === ids.values.toSeq.sorted)
    val viaIds = UnigramLm.encodeUnigramToIds(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Int](1).map(ids)).toMap
    val viaStrings = UnigramLm.encodeUnigramTokens(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaIds === viaStrings, "id decode must reproduce the string surface")
  }

  test("pruneTo shrinks the active set between iterations; singles always survive") {
    val docs = Seq(
      (1L, "abababab abababab"), (2L, "abababab cd cd"),
      (3L, "efef efef gh"), (4L, "abababab efef")).toDF("doc_id", "text")
    val pruned = UnigramLm.trainUnigram(docs, "text", maxPieceLen = 4,
      vocabSize = 30, iters = 2, pruneTo = Some(2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val multi = pruned.keys.filter(p => p.codePointCount(0, p.length) > 1)
    assert(multi.size <= 2, s"at most pruneTo multi-char pieces survive, got $multi")
    assert(pruned.contains("abab"), s"the dominant unit must survive the prune: $pruned")
    // prune=None stays the fixed-set q170 contract: more multi pieces live
    val full = UnigramLm.trainUnigram(docs, "text", maxPieceLen = 4,
      vocabSize = 30, iters = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(multi.toSet.subsetOf(full), "pruned survivors come from the seeded set")
  }

  test("byte fallback: alien pre-tokens degrade to byte pieces — no dropped pre-tokens, lossless decode") {
    import graft.expressions.ByteRemap
    // train on PLAIN ASCII only; encode text with scripts the training
    // corpus never saw (accents, CJK, an astral emoji)
    val train = Seq((1L, "abab abab cd"), (2L, "abab cd cd")).toDF("doc_id", "text")
    val model = UnigramLm.trainUnigram(train, "text", maxPieceLen = 4,
      vocabSize = 20, iters = 2, byteLevel = true)
    val counts = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the full 256-symbol byte alphabet is retained, count 0 allowed
    ByteRemap.byteToChar.foreach(ch => assert(counts.contains(ch.toString),
      s"byte single '$ch' missing from the byteLevel model"))
    assert(counts.exists(_._2 == 0L), "unseen byte singles must survive at count 0")
    val alien = Seq((5L, "ab café 日本 🙂")).toDF("doc_id", "text")
    val enc = UnigramLm.encodeUnigram(alien, "doc_id", "text", model,
      maxPieceLen = 4, byteLevel = true)
      .orderBy(col("pos")).collect()
    assert(enc.nonEmpty)
    // LOSSLESS: unremapping the concatenated byte-symbol tokens reproduces
    // the original text exactly — nothing dropped, astral plane included
    val back = ByteRemap.unremapString(enc.map(_.getString(2)).mkString)
    assert(back === "ab café 日本 🙂", s"lossless decode broke: got '$back'")
    // the code-point (non-byteLevel) regime DOES drop the alien pre-tokens
    // against a model lacking their characters — the exact failure byte
    // fallback removes
    val cpModel = UnigramLm.trainUnigram(train, "text", maxPieceLen = 4,
      vocabSize = 20, iters = 2)
    val cpEnc = UnigramLm.encodeUnigram(alien, "doc_id", "text", cpModel,
      maxPieceLen = 4).collect()
    assert(cpEnc.length < enc.length,
      "without byte fallback the alien pre-tokens must have vanished")
    // ids surface: every fallback piece prices through vocabIds (the model
    // carries the full alphabet, so no id lookup can miss)
    val ids = UnigramLm.encodeUnigramToIds(alien, "doc_id", "text", model,
      maxPieceLen = 4, byteLevel = true)
      .select(explode(col("token_ids"))).as[Int].collect()
    assert(ids.length === enc.length, "id surface must price every fallback piece")
  }

  test("loud contracts: bad geometry and empty model") {
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      UnigramLm.trainUnigram(docs, "text", maxPieceLen = 1))
    intercept[IllegalArgumentException](
      UnigramLm.trainUnigram(docs, "text", iters = 0))
    intercept[IllegalArgumentException](
      UnigramLm.encodeUnigram(docs, "doc_id", "text",
        Seq.empty[(String, Long)].toDF("piece", "cnt")))
  }

  test("bitSurprisal: hand-computed floor-log2 pricing, count-0 fallback, degenerate docs") {
    // model (ab:6, a:1, b:1), total 8 → bits: ab = bitlen(8 div 6)−1 = 0,
    // a = b = bitlen(8 div 1)−1 = 3
    val model = Seq(("ab", 6L), ("a", 1L), ("b", 1L)).toDF("piece", "cnt")
    val docs = Seq(
      (1L, "ab"),   // one piece [ab] → (1, 0, 0.0)
      (2L, "aab"),  // Viterbi [a, ab] (0.125·0.75 beats a·a·b) → (2, 3, 1.5)
      (3L, "")      // no pre-tokens → (0, 0, 0.0) by convention
    ).toDF("doc_id", "text")
    val out = UnigramLm.bitSurprisal(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((1L, 0L, 0.0)))
    assert(out(2L) === ((2L, 3L, 1.5)))
    assert(out(3L) === ((0L, 0L, 0.0)))
    // a count-0 piece (the byte-fallback convention) prices bitlen(total) —
    // one more than the rarest positive piece can reach
    val zm = Seq(("a", 1L), ("b", 0L)).toDF("piece", "cnt")
    val z = UnigramLm.bitSurprisal(Seq((1L, "ab")).toDF("doc_id", "text"),
      "doc_id", "text", zm).collect()(0)
    assert((z.getLong(1), z.getLong(2), z.getDouble(3)) === ((2L, 1L, 0.5)))
    intercept[IllegalArgumentException](
      UnigramLm.bitSurprisal(docs, "doc_id", "text",
        Seq.empty[(String, Long)].toDF("piece", "cnt")))
  }
}
