package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-passage removal — the substring-level dedup of Lee et al.
  * 2022 ("Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499, the EXACTSUBSTR setting, re-expressed relationally): any
  * token window of width `windowTokens` whose content occurs MORE THAN ONCE in
  * the corpus (across documents or repeated within one) is removed from every
  * document containing it. Complements document-level dedup (exact / MinHash /
  * SimHash / containment): those drop whole near-identical documents; this
  * strips boilerplate passages (licenses, navigation chrome, repeated
  * disclaimers) embedded inside otherwise-unique documents.
  *
  * The paper builds a corpus-wide suffix array; the relational equivalent is a
  * fixed-width gram inventory, which finds exactly the duplicated substrings of
  * length ≥ W tokens (a duplicated run of length L ≥ W is covered by its L−W+1
  * duplicated windows, so the whole run is removed — same removal set as the
  * suffix-array method for the ≥W granularity).
  *
  * Scale shape, stage by stage:
  *   1. gram inventory: tokens are pre-hashed to 64-bit ONCE per token (not
  *      once per covering window — each token sits in up to W windows), then
  *      every W-token window keys as a PAIR of xxhash64 values over the
  *      hashed-token slice. The second key PREPENDS a literal before the slice
  *      (`xxhash64(1L, gh)`), which re-seeds the 64-bit chained state BEFORE
  *      any gram data — two members of the hash family with independent
  *      collisions, an effective 128-bit key (pair-collision ≈ n²/2^129,
  *      ~1e-15 at a trillion grams, vs ~27k expected collisions for any
  *      64-bit single key there). Appending the literal instead
  *      (`xxhash64(gh, 1L)`) would NOT work: XxHash64 chains 64 bits of state
  *      across arguments, so a trailing-salt "second" key is a pure function
  *      of the first and adds zero entropy.
  *      The shuffle carries (gk1, gk2, doc_id, start) —
  *      16-byte key vs the 32-hex-char md5 string it replaces, and no
  *      per-window string concatenation on the scan side (the round-6 ×1000
  *      stage profile put ~2,900 CPU-seconds in exactly that map work);
  *   2. duplicated grams: one hash aggregate on the key pair with map-side
  *      partial counts; uniform hashed keys → no skew;
  *   3. span collection: duplicated occurrences aggregate per doc as START
  *      offsets only (collect_set(start), W× smaller than exploding covered
  *      positions pre-shuffle); the start→[start, start+W) expansion happens
  *      per-row AFTER the shuffle via a higher-order flatten;
  *   4. reassembly: per-row filter of the staged token array against the
  *      covered-position set — scan-side, no further shuffle. Membership is
  *      array_contains per position (O(n·c) worst case); duplicated coverage is
  *      a small fraction of most documents, and fully-duplicated documents are
  *      better handled by document-level exact dedup FIRST (as the curation
  *      pipeline does), which caps c.
  *
  * At 100 TB the only all-corpus state is the duplicated-gram key set (stage
  * 2's output), which is the long tail of the gram frequency distribution —
  * orders of magnitude smaller than the corpus; the join in stage 3 is an
  * equi-join on the digest key that AQE can broadcast when the duplicated set
  * is small.
  */
object PassageDedup {

  /** Remove every duplicated `windowTokens`-token passage from each document.
    *
    * Output: (doc_id, n_tokens, n_removed, cleaned_text) — token counts over
    * the whitespace tokenization, `cleaned_text` the surviving tokens joined by
    * single spaces in original order ("" when the whole document is duplicated
    * passages).
    */
  def removeDuplicatedPassages(
      docs: DataFrame, idCol: String, textCol: String, windowTokens: Int): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2, got $windowTokens")
    val w = windowTokens

    // Stage the token array ONCE (HOF lambdas re-evaluate child trees per
    // element — `toks` must be a column ref, not an inline split()).
    val toks = docs.select(
      col(idCol).as("doc_id"),
      split(trim(lower(col(textCol))), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))

    // 1. Gram inventory: 1-based start positions of every W-token window.
    //    Tokens are hashed once each; window keys hash the W-long slice (staged
    //    so the slice is computed once for both seeds).
    val grams = toks
      .filter(col("n") >= w)
      .withColumn("hts", transform(col("toks"), t => xxhash64(t)))
      .select(col("doc_id"),
        explode(sequence(lit(1), col("n") - (w - 1))).as("start"),
        col("hts"))
      .select(col("doc_id"), col("start"),
        slice(col("hts"), col("start"), lit(w)).as("gh"))
      .select(col("doc_id"), col("start"),
        xxhash64(col("gh")).as("gk1"), xxhash64(lit(1L), col("gh")).as("gk2"))

    // 2. Grams occurring more than once anywhere in the corpus.
    val dup = grams.groupBy(col("gk1"), col("gk2"))
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("gk1"), col("gk2"))

    // 3. Duplicated-window starts per doc; expand to covered positions per-row
    //    AFTER the aggregate (shuffle carries starts, not W× positions).
    val covered = grams.join(dup, Seq("gk1", "gk2"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("start")).as("starts"))
      .select(col("doc_id"),
        array_distinct(flatten(transform(col("starts"),
          s => sequence(s, s + (w - 1))))).as("covered"))

    // 4. Reassemble the surviving tokens in order.
    toks.join(covered, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        coalesce(size(col("covered")), lit(0)).cast("long").as("n_removed"),
        when(col("covered").isNull, concat_ws(" ", col("toks")))
          .otherwise(concat_ws(" ",
            transform(
              filter(sequence(lit(1), col("n")),
                p => !array_contains(col("covered"), p)),
              p => element_at(col("toks"), p))))
          .as("cleaned_text"))
  }
}
