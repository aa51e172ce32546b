package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling — the "global shuffle" step of training-data
  * prep: each epoch needs the corpus in a fresh pseudo-random order, yet the
  * order must be REPRODUCIBLE (restart a crashed job, regenerate shard 17,
  * audit which examples a step saw) — so no `rand()`, no `sample()`. The
  * shuffle key is md5(id:epoch): changing the epoch re-deals every position,
  * fixing it makes regeneration idempotent.
  *
  * Scale shape: shard assignment is a pure scan-side expression; the only
  * shuffle is the per-shard window that materializes positions, and it is
  * keyed BY shard — exactly the partitioning the downstream shard writer
  * needs, so Spark reuses one exchange for position numbering and the
  * partitioned write. Positions are per-shard (shard, pos) rather than a
  * global rank: a single global row_number would serialize through one
  * partition; readers consume shards independently anyway.
  */
object Sharding {

  /** (id, shard, pos): epoch-deterministic shard in [0, numShards) and 1-based
    * position within the shard; both stable under re-execution. */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    require(epoch >= 0, s"epoch must be non-negative: $epoch")
    val key = md5(concat(col(idCol).cast("string"), lit(":"), lit(epoch.toString)))
    val staged = docs.select(col(idCol), key.as("_k"))
      .select(col(idCol), col("_k"),
        // shard = first-32-md5-bits(key) mod shards — the md5Bits32 primitive,
        // inlined on the staged digest so the hash is computed once
        pmod(conv(substring(col("_k"), 1, 8), 16, 10).cast("long"),
          lit(numShards.toLong)).as("shard"))
    staged.select(col(idCol), col("shard"),
      row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("_k"), col(idCol)))
        .cast("long").as("pos"))
  }
}
