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
    * filter at 8M bits / 5 hashes ≈ 1MB for ~1M keys at ~3% FPR.
    *
    * The key columns must have the SAME data type: xxhash64 is type-sensitive
    * (hash(5: int) != hash(5L: bigint)), so a type mismatch that the exact
    * equi-join would paper over with an implicit cast would silently empty the
    * bloom pre-filter — guarded by a require instead. */
  def semiJoinPruned(big: DataFrame, bigKey: String,
                     small: DataFrame, smallKey: String,
                     numBits: Int = 1 << 23, numHashes: Int = 5): DataFrame = {
    // resolve through the analyzer (col()), not StructType.apply — key lookup
    // must follow Spark's case-insensitive resolution
    val bigType = big.select(col(bigKey)).schema.head.dataType
    val smallType = small.select(col(smallKey)).schema.head.dataType
    require(bigType == smallType,
      s"join key types must match for hash-identical bloom probes: " +
        s"$bigKey is $bigType, $smallKey is $smallType — cast one side first")
    // reserved-name projection keeps the join unambiguous when bigKey == smallKey
    // — which requires the BIG side not to carry that name itself
    require(!big.columns.exists(_.equalsIgnoreCase("__bloom_join_key")),
      "big side must not contain the reserved column __bloom_join_key")
    // the small side is consumed TWICE (bloom aggregate now, semi-join build
    // later): materialize once so an expensive upstream (a filtered scan, a
    // prior join) isn't recomputed — small by contract, so the checkpoint is cheap
    val keys = small.select(col(smallKey).as("__bloom_join_key")).localCheckpoint()
    val bytes = keys
      .agg(BloomFilters.bloomAgg(xxhash64(col("__bloom_join_key")), numBits, numHashes).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    big
      .filter(BloomFilters.mightContain(lit(bytes), xxhash64(col(bigKey))))
      .join(keys, col(bigKey) === col("__bloom_join_key"), "left_semi")
  }
}
