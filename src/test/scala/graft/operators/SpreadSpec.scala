package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Spread]] gating contract: the byte-gated [[Spread.widen]] must be the
  * identity for small inputs (shuffling a small payload costs more than the
  * single-core work it parallelizes — the r16 regression), must fan out an
  * under-split input once its size estimate crosses the per-partition byte
  * target, and must never touch a plan that already carries an exchange.
  * [[Spread.widenForCompute]] stays unconditional (caller-declared heavy
  * per-row compute over narrow rows). */
class SpreadSpec extends SparkSpec {

  private def parts(df: DataFrame): Int =
    df.rdd.getNumPartitions

  private def onePartDocs(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"doc text number $i")).toDF("doc_id", "text")
      .coalesce(1)
  }

  test("widen: identity for a small single-partition input (byte gate)") {
    val docs = onePartDocs(64)
    val out = Spread.widen(docs)
    assert(parts(out) === 1, "small input must not be repartitioned")
    // and the plan gains no exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("widen: fans out an under-split input when bytes cross the target") {
    val docs = onePartDocs(64)
    val p = spark.sparkContext.defaultParallelism
    spark.conf.set(Spread.TargetBytesKey, "16") // 16-byte slices: everything is "large"
    try {
      val out = Spread.widen(docs)
      assert(parts(out) === p,
        s"under-split large input must widen to defaultParallelism $p")
    } finally spark.conf.unset(Spread.TargetBytesKey)
  }

  test("widen: capped by defaultParallelism, never above it") {
    val docs = onePartDocs(1000)
    spark.conf.set(Spread.TargetBytesKey, "1")
    try {
      assert(parts(Spread.widen(docs)) === spark.sparkContext.defaultParallelism)
    } finally spark.conf.unset(Spread.TargetBytesKey)
  }

  test("widen: identity for a plan that already carries an exchange") {
    val docs = onePartDocs(64)
    val agg = docs.groupBy(col("text")).agg(count(lit(1)).as("n"))
    spark.conf.set(Spread.TargetBytesKey, "1") // even when the gate says widen
    try {
      val out = Spread.widen(agg)
      assert(out.queryExecution.logical eq agg.queryExecution.logical,
        "exchange-bearing (adaptive) plans must pass through untouched")
    } finally spark.conf.unset(Spread.TargetBytesKey)
  }

  test("widenForCompute: unconditional fan-out of a 1-partition narrow scan") {
    val ids = onePartDocs(64).select(col("doc_id"))
    val out = Spread.widenForCompute(ids)
    assert(parts(out) === spark.sparkContext.defaultParallelism)
    // identity when the input already has enough partitions
    val wide = ids.repartition(spark.sparkContext.defaultParallelism)
    // repartition introduces an exchange => adaptive plan => identity
    assert(Spread.widenForCompute(wide).queryExecution.logical
      eq wide.queryExecution.logical)
  }

  test("widen preserves rows and values exactly") {
    import spark.implicits._
    val docs = onePartDocs(100)
    spark.conf.set(Spread.TargetBytesKey, "16")
    try {
      val a = Spread.widen(docs).as[(Long, String)].collect().sortBy(_._1)
      val b = docs.as[(Long, String)].collect().sortBy(_._1)
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.unset(Spread.TargetBytesKey)
  }
}
