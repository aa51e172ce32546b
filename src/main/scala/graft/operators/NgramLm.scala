package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language model for quality filtering — the CCNet recipe
  * (Wenzek et al. 2020): score each document by how surprising its token
  * transitions are under a model trained on trusted text; keep the head of
  * the distribution. Two scoring surfaces:
  *
  *   - [[oovBigramRate]] — the fraction of a document's adjacent token pairs
  *     unseen (or below `minCount`) in the trained bigram table. Pure integer
  *     counting plus one exactly-rounded IEEE division, so it is
  *     oracle-replayable cell-for-cell (q142) — the cheap novelty signal.
  *   - [[avgNegLogProb]] — add-one-smoothed conditional bigram NLL per token,
  *     the real perplexity-style ranking. `ln` is libm-dependent (not
  *     oracle-hashable cross-engine), so this surface is property-spec'd:
  *     in-domain text must score lower than shuffled/out-of-domain text.
  *
  * Scale shape: training is two corpus passes that both reduce map-side to
  * VOCABULARY-sized tables — (w, c) unigrams and (w1, w2, c) bigrams (the
  * Zipf-bounded object every LM pipeline ships, not corpus-sized). Scoring
  * explodes each document's bigrams once and equi-joins the count tables by
  * 8-byte-hashable string keys; AQE broadcasts them when they fit, and the
  * per-doc re-aggregation is map-side combinable. Nothing corpus-sized ever
  * sits on the driver.
  */
object NgramLm {

  /** Adjacent token pairs (w1, w2) over a STAGED token-array column — empty
    * for 0/1-token docs. Takes the staged column, never the raw text: an
    * expression inlined into a HOF lambda re-evaluates per element (the
    * tokenizer would run twice per bigram — O(len²) per doc; measured 13.2 s
    * → 2.4 s on q142 at sf0.1 when the first version made exactly that
    * mistake). */
  private def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + lit(1)).as("w2"))))

  /** (extra columns…, exploded bigram struct `b`) with tokens staged. */
  private def explodedBigrams(df: DataFrame, keep: Seq[String],
                              textCol: String): DataFrame =
    df.select(keep.map(col) :+ TextFunctions.tokens(col(textCol)).as("_toks"): _*)
      .select(keep.map(col) :+ explode(bigramsOf(col("_toks"))).as("b"): _*)

  /** Trained unigram table (w, c) — one map-side-combined aggregate. */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Trained bigram table (w1, w2, c) — one map-side-combined aggregate. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    explodedBigrams(docs, Nil, textCol)
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  /** Per-document OOV-bigram novelty: (idCol, n_bigrams, n_oov, oov_rate) —
    * a bigram counts as OOV when its trained count is NULL (unseen) or
    * < `minCount`. Documents with no bigrams score rate 0.0 (nothing to be
    * surprised by; the length gates handle degenerate docs). Integer counts
    * + one exact IEEE division — oracle-replayable. */
  def oovBigramRate(docs: DataFrame, idCol: String, textCol: String,
                    bigrams: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    val exploded = explodedBigrams(docs, Seq(idCol), textCol)
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val joined = exploded.join(bigrams, Seq("w1", "w2"), "left")
    val perDoc = joined.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("c").isNull || col("c") < minCount, 1L).otherwise(0L)).as("n_oov"))
    // 0/1-token docs vanish in the explode — restore them with zero bigrams
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_bigrams") === 0, lit(0.0))
          .otherwise(col("n_oov").cast("double") / col("n_bigrams").cast("double")))
  }

  /** Per-document average negative log conditional bigram probability
    * (add-one smoothing over a vocabulary of size V):
    * NLL = −(1/n)·Σ ln((c(w1,w2)+1)/(c(w1)+V)). Lower = more in-domain.
    * Docs with no bigrams get NULL (no evidence either way). Property-spec'd,
    * not oracle-hashed: ln is libm-dependent cross-engine. */
  def avgNegLogProb(docs: DataFrame, idCol: String, textCol: String,
                    unigrams: DataFrame, bigrams: DataFrame,
                    vocabSize: Long): DataFrame = {
    require(vocabSize >= 1L, s"vocabSize must be >= 1: $vocabSize")
    val exploded = explodedBigrams(docs, Seq(idCol), textCol)
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val joined = exploded
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(unigrams.select(col("w").as("w1"), col("c").as("_c1")), Seq("w1"), "left")
    val nll = -log((coalesce(col("c"), lit(0L)).cast("double") + 1.0) /
      (coalesce(col("_c1"), lit(0L)).cast("double") + vocabSize.toDouble))
    val perDoc = joined.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      (sum(nll) / count(lit(1))).as("avg_nll"))
    // 0/1-token docs vanish in the explode — restore them with NULL avg_nll
    // so the output is one row per input document, as documented.
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }
}
