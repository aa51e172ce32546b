package graft.expressions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("equals size(array_intersect) on random sorted-distinct long arrays") {
    val rnd = new Random(42)
    val rows = (1 to 300).map { i =>
      def arr() = rnd.shuffle((0L to 400L).toList).take(rnd.nextInt(60))
        .distinct.sorted.toArray
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
      NativeArr.sortedIntersectSize(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"mismatch: $r"))
    // empty and disjoint edges
    val edge = Seq((Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L)),
      (Array(7L), Array(7L))).toDF("a", "b")
      .select(NativeArr.sortedIntersectSize(col("a"), col("b"))).as[Long].collect()
    assert(edge.toSeq == Seq(0L, 0L, 1L))
  }

  test("null array is null; participates in whole-stage codegen") {
    val nulls = Seq((Some(Array(1L)), None: Option[Array[Long]]))
      .toDF("a", "b")
      .select(NativeArr.sortedIntersectSize(col("a"), col("b")).as("n"))
    assert(nulls.head().isNullAt(0))
    val vecs = spark.range(100).select(col("id"),
      sequence(col("id"), col("id") + 9L).as("a"),
      sequence(col("id") + 5L, col("id") + 14L).as("b"))
    val df = vecs.select(NativeArr.sortedIntersectSize(col("a"), col("b")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l =>
      l.trim.matches("""\*\(\d+\) Project \[sorted_intersect_size.*""")), plan)
    assert(df.filter(col("n") === 5L).count() == 100) // overlap of 5 each row
  }

  test("sorted_intersect_size is available through GraftExtensions SQL injection") {
    // same injection body the extensions class uses
    graft.SparkSpec // touch
    val spark2 = spark
    org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction(spark2,
      "sorted_intersect_size",
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      exprs => SortedIntersectSize(exprs.head, exprs(1)))
    val r = spark2.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS n")
      .head().getLong(0)
    assert(r == 2L)
  }
}
