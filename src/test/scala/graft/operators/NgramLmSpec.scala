package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "the dog sat on the mat")).toDF("doc_id", "text")

  test("bigram/unigram counts: hand-checked, case-folded, map-side aggregable integers") {
    val bg = NgramLm.bigramCounts(corpus, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg(("the", "cat")) === 2L)
    assert(bg(("sat", "on")) === 3L)
    assert(bg(("the", "rug")) === 1L)
    val ug = NgramLm.unigramCounts(corpus, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ug("the") === 6L && ug("sat") === 3L && ug("rug") === 1L)
  }

  test("oovBigramRate: threshold semantics, short docs score zero, unseen bigrams count") {
    val lm = NgramLm.bigramCounts(corpus, "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),  // all bigrams seen >= 2... except (the,mat)=2
      (11L, "purple elephants sing loudly"), // all unseen
      (12L, "word"),                    // 1 token -> no bigrams
      (13L, "")).toDF("doc_id", "text")
    val out = NgramLm.oovBigramRate(probe, "doc_id", "text", lm, minCount = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 10 bigrams: the-cat(2) cat-sat(2) sat-on(3) on-the(3) the-mat(2) -> 0 oov
    assert(out(10L) === ((5L, 0L, 0.0)))
    assert(out(11L) === ((3L, 3L, 1.0)))
    assert(out(12L) === ((0L, 0L, 0.0)))
    assert(out(13L) === ((0L, 0L, 0.0)))
    // minCount raises the bar: at 3, only sat-on / on-the survive in doc 10
    val strict = NgramLm.oovBigramRate(probe, "doc_id", "text", lm, minCount = 3L)
      .filter($"doc_id" === 10L).collect()(0)
    assert((strict.getLong(1), strict.getLong(2)) === ((5L, 3L)))
    intercept[IllegalArgumentException](
      NgramLm.oovBigramRate(probe, "doc_id", "text", lm, minCount = 0L))
  }

  test("oovFailingIds: exact complement of the oovBigramRate keep-set, no-bigram docs never fail") {
    val lm = NgramLm.bigramCounts(corpus, "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),       // 0 OOV at minCount 2
      (11L, "purple elephants sing loudly"), // all OOV -> rate 1.0
      (12L, "word"),                         // no bigrams -> rate 0.0, never fails
      (13L, ""),
      (14L, "the cat sang strangely")).toDF("doc_id", "text") // mixed rate
    for (maxRate <- Seq(0.0, 0.3, 0.5, 1.0)) {
      val kept = NgramLm.oovBigramRate(probe, "doc_id", "text", lm, minCount = 2L)
        .filter(col("oov_rate") <= maxRate)
        .select(col("doc_id")).as[Long].collect().toSet
      val failing = NgramLm.oovFailingIds(probe, "doc_id", "text", lm,
        minCount = 2L, maxOovRate = maxRate).as[Long].collect().toSet
      val all = probe.select(col("doc_id")).as[Long].collect().toSet
      assert(failing === (all -- kept), s"complement mismatch at maxRate=$maxRate")
      assert(!failing.contains(12L) && !failing.contains(13L),
        "no-bigram docs can never fail a non-negative threshold")
    }
    intercept[IllegalArgumentException](
      NgramLm.oovFailingIds(probe, "doc_id", "text", lm, 2L, -0.1))
  }

  test("knTrigramFailingIds: exact complement of the knTrigramBits keep-set") {
    val tri = NgramLm.trigramCounts(corpus, "text")
    val probe = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "purple elephants sing loudly today"),
      (12L, "two words"), // <3 tokens -> avg 0.0, never fails
      (13L, "the dog sat on the rug")).toDF("doc_id", "text")
    for (maxBits <- Seq(0.0, 2.0, 4.0, 8.0)) {
      val kept = NgramLm.knTrigramBits(probe, "doc_id", "text", tri)
        .filter(col("avg_bits") <= maxBits)
        .select(col("doc_id")).as[Long].collect().toSet
      val failing = NgramLm.knTrigramFailingIds(probe, "doc_id", "text", tri,
        maxBits).as[Long].collect().toSet
      val all = probe.select(col("doc_id")).as[Long].collect().toSet
      assert(failing === (all -- kept), s"complement mismatch at maxBits=$maxBits")
      assert(!failing.contains(12L),
        "short docs can never fail a non-negative threshold")
    }
    intercept[IllegalArgumentException](
      NgramLm.knTrigramFailingIds(probe, "doc_id", "text", tri, -1.0))
  }

  test("avgNegLogProb: in-domain text scores lower NLL than novel text; no-bigram docs are NULL") {
    val ug = NgramLm.unigramCounts(corpus, "text")
    val bg = NgramLm.bigramCounts(corpus, "text")
    val v = ug.count()
    val probe = Seq(
      (20L, "the cat sat on the mat"),       // in-domain
      (21L, "mat the on sat cat the"),       // same words, scrambled transitions
      (22L, "zebras quantize gradients"),    // fully out-of-domain
      (23L, "single")).toDF("doc_id", "text")
    val out = NgramLm.avgNegLogProb(probe, "doc_id", "text", ug, bg, v)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(20L).get < out(21L).get, "in-domain order must beat scrambled order")
    assert(out(20L).get < out(22L).get, "in-domain text must beat out-of-domain")
    // add-one fine print (a real smoothing property, asserted so nobody
    // "fixes" it): an UNKNOWN context scores the uniform 1/V, which can beat
    // a KNOWN context's unseen transition (1/(c(w1)+V)) — so fully-novel
    // text is NOT guaranteed to score worse than scrambled known text
    assert(math.abs(out(22L).get - math.log(7.0)) < 1e-12,
      "unknown contexts score the uniform ln(V)") // −ln(1/V) ≠ ln(V) by 1 ulp
    // one row PER INPUT DOC (the documented contract): a 1-token doc is
    // present with NULL avg_nll, not silently dropped by the explode
    assert(out.keySet === Set(20L, 21L, 22L, 23L))
    assert(out(23L).isEmpty, "no-bigram doc must carry NULL avg_nll")
    // smoothing sanity: every NLL is positive and finite
    out.values.flatten.foreach(nll => assert(nll > 0.0 && !nll.isInfinite))
  }

  test("knTrigramBits: hand-computed interpolated-KN rationals on a minimal corpus") {
    // corpus trigrams: (a,b,c) ×2, (a,b,d) ×1 — every KN table is
    // hand-checkable: c12(a,b)=3 t12=2; n2(b,c)=n2(b,d)=1; tot2(b)=2
    // t2(b)=2; n1(c)=n1(d)=1; nAll=2
    val tiny = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val tri = NgramLm.trigramCounts(tiny, "text")
    assert(tri.collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
      === Map(("a", "b", "c") -> 2L, ("a", "b", "d") -> 1L))
    val probe = Seq(
      (10L, "a b c"), // P3 = (3·8+2·4)/48 = 2/3 → floor(log2(48 div 32)) = 0 bits
      (11L, "a b d"), // P3 = (1·8+2·4)/48 = 1/3 → floor(log2(3)) = 1 bit
      (12L, "x y z"), // unseen middle → P1 = 0/2 → num=0 → bitlen(nAll)=2
      (13L, "a b x"), // seen context, unseen continuation → num3=0 → bitlen(48)=6
      (14L, "a b"),   // no trigrams → 0.0 by convention
      (15L, "")).toDF("doc_id", "text")
    val out = NgramLm.knTrigramBits(probe, "doc_id", "text", tri)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(10L) === ((1L, 0L, 0.0)))
    assert(out(11L) === ((1L, 1L, 1.0)))
    assert(out(12L) === ((1L, 2L, 2.0)))
    assert(out(13L) === ((1L, 6L, 6.0)))
    assert(out(14L) === ((0L, 0L, 0.0)))
    assert(out(15L) === ((0L, 0L, 0.0)))
    assert(out.keySet === Set(10L, 11L, 12L, 13L, 14L, 15L),
      "one row per input doc")
    // a corpus with no trigram at all is a loud error, not a silent zero
    intercept[IllegalArgumentException](NgramLm.knTrigramBits(
      probe, "doc_id", "text",
      NgramLm.trigramCounts(Seq((1L, "a b")).toDF("doc_id", "text"), "text")))
  }

  test("knTrigramBits/knTrigramNll: in-domain ranks below scrambled and out-of-domain") {
    val tri = NgramLm.trigramCounts(corpus, "text")
    val probe = Seq(
      (20L, "the cat sat on the mat"),   // in-domain
      (21L, "mat the on sat cat the"),   // same words, scrambled
      (22L, "zebras quantize gradients fast today"), // out-of-domain
      (23L, "two words")).toDF("doc_id", "text")
    val bits = NgramLm.knTrigramBits(probe, "doc_id", "text", tri)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(bits(20L) < bits(21L), "in-domain must price below scrambled")
    assert(bits(20L) < bits(22L), "in-domain must price below out-of-domain")
    val nll = NgramLm.knTrigramNll(probe, "doc_id", "text", tri)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(nll(20L).get < nll(21L).get && nll(20L).get < nll(22L).get)
    assert(nll(23L).isEmpty, "no-trigram doc carries NULL avg_nll")
    nll.values.flatten.foreach(v => assert(v > 0.0 && !v.isInfinite))
  }
}
