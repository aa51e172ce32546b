package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

class BridgeSpec extends SparkSpec {
  import spark.implicits._

  test("dropRootSort strips a root global sort but preserves top-k Limit(Sort)") {
    val df = Seq(3, 1, 2).toDF("v")
    val sorted = df.orderBy(col("v"))
    val stripped = ColumnBridge.dropRootSort(sorted)
    assert(!stripped.queryExecution.optimizedPlan.toString.contains("Sort"))
    assert(stripped.collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
    // top-k: the Sort sits under Limit, NOT at the root — must be preserved
    val topk = df.orderBy(col("v").desc).limit(1)
    val keptTopk = ColumnBridge.dropRootSort(topk)
    assert(keptTopk.collect().map(_.getInt(0)).toSeq == Seq(3))
    // a frame with no sort passes through untouched
    assert(ColumnBridge.dropRootSort(df).collect().length == 3)
  }
}
