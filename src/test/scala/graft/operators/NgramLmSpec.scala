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
}
