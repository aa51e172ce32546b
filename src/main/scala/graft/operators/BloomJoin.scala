package graft.operators

import graft.expressions.BloomFilters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join — cut the big side's shuffle BEFORE the join.
  *
  * A plain `big ⋉ small` on a 100 TB fact side shuffles every big-side row to
  * its join partition, matches or not. When the filtered small side is still
  * too large (or too late in the plan) for Spark's automatic broadcast or
  * runtime-filter injection, this operator builds a [[graft.expressions
  * .BloomFilterAgg]] over the small side's keys (one tiny aggregate — the
  * filter is KBs-to-MBs for millions of keys at ~10 bits/key), ships it to
  * every scan task as a literal, and drops non-matching rows DURING the big
  * side's scan via the codegen probe. Only probable matches reach the exact
  * join that follows, which seals correctness: a Bloom filter has no false
  * negatives, so pre-filter + exact join ≡ exact join (the q97 oracle
  * identity), and false positives merely cost a little pruning efficiency.
  */
object BloomJoin {

  /** `big ⋉ small` on `bigKey = smallKey`, bloom-pruned. Defaults size the
    * filter at 8M bits / 5 hashes ≈ 1MB for ~1M keys at ~3% FPR. */
  def semiJoinPruned(big: DataFrame, bigKey: String,
                     small: DataFrame, smallKey: String,
                     numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    val bytes = small
      .agg(BloomFilters.bloomAgg(xxhash64(col(smallKey)), numBits, numHashes).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    big
      .filter(BloomFilters.mightContain(lit(bytes), xxhash64(col(bigKey))))
      .join(small.select(col(smallKey)), col(bigKey) === col(smallKey), "left_semi")
  }
}
