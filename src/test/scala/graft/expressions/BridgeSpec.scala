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

  test("vec_dot in a filter over NON-nullable arrays stays codegen-compilable") {
    // Regression: without VecDot.nullable=true, non-nullable children bound
    // ev.isNull to a literal and the generated predicate failed to compile
    // (interpreted fallback). Correct rows + no exception is the contract here.
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0))).toDF("id", "v")
    val kept = df.filter(
      graft.expressions.NativeVec.dot(col("v"), array(lit(1.0), lit(0.0))) > 0.5)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("misra_gries registers for SQL via extensions-style builder") {
    ColumnBridge.registerFunction(spark, "misra_gries",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MisraGries].getName, "misra_gries"),
      exprs => MisraGries(exprs.head,
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int]).toAggregateExpression())
    val m = spark.sql(
      "SELECT misra_gries(t, 4) AS m FROM VALUES ('a'),('a'),('b') AS v(t)")
      .head().getMap[String, Long](0)
    assert(m("a") == 2L && m("b") == 1L)
  }
}
