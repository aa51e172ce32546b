package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic span corruption — the denoising-objective data prep of
  * T5/BART-family pretraining: mask a fraction of tokens, collapse each
  * masked RUN into one sentinel (BART's "text infilling" formulation, where a
  * single mask token stands for a whole span). The mask decision is
  * md5(doc:position) — a pure function of the row, so corruption is
  * reproducible across reruns and engines (no rand()), and the same corpus
  * can be re-corrupted per epoch by salting the id upstream.
  *
  * Scale shape: everything is a higher-order function over the staged token
  * and mask arrays — zero shuffle, O(tokens) per doc, corruption happens
  * during the scan. (Numbered T5 sentinels `<extra_id_k>` need a per-token
  * prefix count — a per-doc scan in any engine; the single-sentinel
  * formulation keeps the whole op position-local, which is why it's the one
  * implemented corpus-side.)
  */
object SpanCorruption {

  /** Per-position mask decision for 1-based position column `i` — the shared
    * [[TextFunctions.md5Bits32]] primitive on the "id:pos" key. */
  private def maskedAt(id: Column, i: Column, maskPercent: Int): Column =
    TextFunctions.md5Bits32(concat(id.cast("string"), lit(":"), i.cast("string"))) %
      100L < maskPercent

  /** (id, n_tokens, n_masked, n_spans, corrupted) — masked runs replaced by
    * one `sentinel` each, surviving tokens in order. */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
              maskPercent: Int = 15, sentinel: String = "<mask>"): DataFrame = {
    require(maskPercent >= 0 && maskPercent <= 100, s"bad maskPercent $maskPercent")
    val staged = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        transform(sequence(lit(1), size(col("_toks"))),
          i => maskedAt(col(idCol), i, maskPercent)).as("_m"))
    val m = col("_m")
    // start-of-run: masked here, unmasked before (greatest() keeps the i-1
    // lookup in bounds under ANSI mode; at i=1 the OR arm decides)
    def isStart(i: Column): Column =
      element_at(m, i) && (i === 1 || !element_at(m, greatest(i - 1, lit(1))))
    val idx = sequence(lit(1), size(col("_toks")))
    staged.select(col(idCol),
      size(col("_toks")).cast("long").as("n_tokens"),
      size(filter(m, x => x)).cast("long").as("n_masked"),
      size(filter(idx, i => isStart(i))).cast("long").as("n_spans"),
      array_join(
        filter(
          transform(idx, i =>
            when(!element_at(m, i), element_at(col("_toks"), i))
              .when(isStart(i), lit(sentinel))
              .otherwise(lit(null))),
          x => x.isNotNull),
        " ").as("corrupted"))
  }
}
