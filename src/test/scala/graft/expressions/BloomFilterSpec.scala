package graft.expressions

import graft.SparkSpec
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def buildBytes(keys: Seq[Long], numBits: Int, numHashes: Int,
                         parts: Int = 1): Array[Byte] =
    keys.toDF("k").repartition(parts)
      .agg(BloomFilters.bloomAgg(xxhash64($"k"), numBits, numHashes))
      .collect()(0).getAs[Array[Byte]](0)

  test("no false negatives, ever — even in a saturated 64-bit filter") {
    val keys = (1L to 1000L).toSeq
    val bytes = buildBytes(keys, numBits = 64, numHashes = 3)
    val misses = keys.toDF("k")
      .filter(!BloomFilters.mightContain(lit(bytes), xxhash64($"k")))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate is sane at ~10 bits per key") {
    val bytes = buildBytes((1L to 1000L).toSeq, numBits = 1 << 14, numHashes = 5)
    val fps = (100001L to 110000L).toSeq.toDF("k")
      .filter(BloomFilters.mightContain(lit(bytes), xxhash64($"k")))
      .count()
    assert(fps < 500L, s"FPR ${fps / 10000.0} too high") // expect ~1%, allow 5%
  }

  test("partition merge ORs bit arrays: multi-partition build equals single") {
    val keys = (1L to 500L).toSeq
    val one = buildBytes(keys, 1 << 12, 4, parts = 1)
    val many = buildBytes(keys, 1 << 12, 4, parts = 7)
    assert(one.toSeq === many.toSeq)
  }

  test("empty build matches nothing") {
    val bytes = buildBytes(Seq.empty[Long], 1 << 10, 4)
    val hits = (1L to 100L).toSeq.toDF("k")
      .filter(BloomFilters.mightContain(lit(bytes), xxhash64($"k")))
      .count()
    assert(hits === 0L)
  }

  test("probe stays inside whole-stage codegen") {
    val bytes = buildBytes(Seq(1L, 2L), 1 << 10, 4)
    val df = spark.range(1, 1000)
      .filter(BloomFilters.mightContain(lit(bytes), xxhash64($"id")))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Filter" = the Filter runs inside WholeStageCodegen stage 1
    assert(plan.contains("*(1) Filter bloom_might_contain"), s"plan:\n$plan")
    assert(!plan.contains("CodegenFallback"), s"plan:\n$plan")
  }

  test("bloom-pruned semi join equals the exact semi join, even with a tiny bloom") {
    val big = (1L to 2000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 1999L, 1500L).toDF("sk")
    // 64-bit filter: false positives guaranteed; exact join must seal them off.
    val pruned = BloomJoin.semiJoinPruned(big, "k", small, "sk",
      numBits = 64, numHashes = 2).orderBy("k").collect()
    val exact = big.join(small, $"k" === $"sk", "left_semi").orderBy("k").collect()
    assert(pruned.toSeq === exact.toSeq)
  }

  test("same-named keys join unambiguously; mismatched key types are refused") {
    val big = (1L to 100L).toSeq.toDF("k")
    val small = Seq(7L, 8L).toDF("k") // same column name on both sides
    val out = BloomJoin.semiJoinPruned(big, "k", small, "k", 1 << 10, 3)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(7L, 8L))
    val intSmall = Seq(7, 8).toDF("sk") // INT vs BIGINT: xxhash64 would disagree
    intercept[IllegalArgumentException] {
      BloomJoin.semiJoinPruned(big, "k", intSmall, "sk", 1 << 10, 3)
    }
  }

  test("null keys on either side neither crash nor leak through the exact join") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(Some(2L), None).toDF("sk")
    val out = BloomJoin.semiJoinPruned(big, "k", small, "sk", 1 << 10, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(2L)) // null never equi-joins
  }
}
