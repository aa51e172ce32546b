package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — grouping documents into fixed token-budget bins
  * (pretraining context windows). Packing is inherently sequential (each
  * boundary depends on the running total), so it cannot be a window function;
  * the distributed shape is per-SHARD sequential: documents are hash-sharded
  * (deterministic md5 buckets, [[TextFunctions.hashBucket]]), each shard is
  * packed independently by an in-order scan inside `mapPartitions` — the one
  * legitimate use of per-partition imperative logic. Shards keep packing
  * embarrassingly parallel at any corpus size; the greedy rule is the standard
  * first-fit-in-order: a document that would overflow the budget starts the
  * next pack (oversized documents occupy a pack alone).
  */
object SequencePacking {

  /** Pack REAL token-id sequences into training rows: greedy per-shard bins
    * ([[packSequences]] on the sequence lengths), then each pack's documents
    * concatenate in ascending-id order (the same order the greedy scan
    * assigned them) with `sepId` between documents — the array a pretraining
    * loader actually reads. Output: (shard, pack, n_docs, packed_ids).
    *
    * Budget semantics: `budget` bounds CONTENT tokens per pack (the greedy
    * rule's accounting); separators add n_docs−1 on top, and an oversized
    * document still occupies a pack alone. That bound is also why the
    * per-pack `collect_list` is safe at any corpus size — a pack holds at
    * most budget tokens (or one document), never a corpus-sized group.
    *
    * Zero-token documents are excluded up front: an empty `idsCol` array
    * contributes nothing to a pack but would break the n_docs−1-separators
    * invariant (the fold's empty-accumulator test cannot distinguish "no doc
    * yet" from "first doc was empty"). The q141 oracle packs non-empty docs
    * only; this filter keeps the contract structural. */
  def packTokenIds(docs: DataFrame, idCol: String, idsCol: String,
                   budget: Long, nShards: Int, sepId: Int = -1): DataFrame = {
    val withN = docs.select(col(idCol), col(idsCol))
      .where(size(col(idsCol)) > 0)
      .withColumn("_n", size(col(idsCol)).cast("long"))
    val assign = packSequences(withN, idCol, "_n", budget, nShards)
    assign.join(withN.select(col(idCol), col(idsCol)), Seq(idCol))
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        aggregate(
          sort_array(collect_list(struct(col(idCol).as("_id"),
            col(idsCol).as("_ids")))),
          array().cast("array<int>"),
          (acc, d) => when(size(acc) === 0, d.getField("_ids"))
            .otherwise(concat(acc, array(lit(sepId)), d.getField("_ids"))))
          .as("packed_ids"))
  }

  /** Pack (id, n_tokens) rows into per-shard greedy bins.
    * Output: (idCol, shard, pack) — pack indices are per-shard, 0-based. */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, s"bad budget=$budget/nShards=$nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val sharded = docs
      .select(col(idCol).cast("long").as("id"), col(nTokensCol).cast("long").as("n"))
      .withColumn("shard", TextFunctions.hashBucket(col("id"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    sharded.select(col("id"), col("n"), col("shard")).as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards may hash into one partition — state resets per shard
        var curShard = Long.MinValue
        var acc = 0L
        var pack = 0L
        it.map { case (id, n, shard) =>
          if (shard != curShard) { curShard = shard; acc = n; pack = 0L }
          else if (acc + n > budget) { pack += 1; acc = n }
          else acc += n
          (id, shard, pack)
        }
      }
      .toDF(idCol, "shard", "pack")
  }
}
