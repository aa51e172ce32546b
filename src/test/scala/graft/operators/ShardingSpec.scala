package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).toDF("doc_id")

  test("re-execution reproduces the identical deal") {
    val a = Sharding.epochShuffle(docs, "doc_id", epoch = 1, numShards = 4)
      .orderBy("doc_id").collect().toSeq
    val b = Sharding.epochShuffle(docs.repartition(7), "doc_id", 1, 4)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("changing the epoch re-deals positions") {
    val e1 = Sharding.epochShuffle(docs, "doc_id", 1, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val e2 = Sharding.epochShuffle(docs, "doc_id", 2, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(e1 !== e2)
  }

  test("positions are a 1..n_shard permutation per shard; shards roughly balanced") {
    val out = Sharding.epochShuffle(docs, "doc_id", 5, 4).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val byShard = out.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // md5 uniformity: no shard should hold more than half of 200 rows
    assert(byShard.values.map(_.length).max < 100)
  }

  test("every doc appears exactly once") {
    val ids = Sharding.epochShuffle(docs, "doc_id", 9, 8).collect().map(_.getLong(0))
    assert(ids.sorted.toSeq === (1L to 200L).toSeq)
  }
}
