package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-candidate counting — the corpus-scale half of tokenizer training
  * (Sennrich et al. 2016): rank adjacent symbol pairs by frequency; the top
  * pair becomes the next merge rule. The loop that applies a merge and
  * recounts is driver-side orchestration over this same primitive; the
  * expensive part — counting over 100 TB — is what must distribute.
  *
  * Scale shape, the classic trick: train on the WORD-FREQUENCY table, not the
  * raw corpus. Pass 1 aggregates pre-tokens ([[TextFunctions.bpeTokens]], the
  * GPT-2-convention pre-tokenizer) to (pre_token, freq) — vocabulary-sized,
  * map-side combined. Pass 2 explodes adjacent character pairs over DISTINCT
  * pre-tokens only and sums freq per pair: the pair count never touches corpus
  * cardinality, and top-k leaves through TakeOrderedAndProject. Integer sums
  * throughout — bit-stable under any partial-agg schedule.
  */
object BpeTrainer {

  /** (pre_token, freq) corpus word-frequency table — pass 1, reusable across
    * merge iterations. */
  def preTokenFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.bpeTokens(col(textCol))).as("pre_token"))
      .groupBy(col("pre_token")).agg(count(lit(1)).as("freq"))

  /** Top-k adjacent character pairs by corpus frequency: (pair, cnt), ordered
    * (cnt desc, pair) — the first BPE merge iteration's candidate ranking. */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    preTokenFrequencies(docs, textCol)
      .filter(length(col("pre_token")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("pre_token")) - 1),
        i => col("pre_token").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }
}
