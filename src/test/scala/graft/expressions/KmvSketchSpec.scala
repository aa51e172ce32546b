package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def minima(values: Seq[Long], k: Int, parts: Int): Seq[Long] =
    values.toDF("hv").repartition(parts)
      .agg(KmvSketch.kmvMinima(col("hv"), k))
      .head().getSeq[Long](0).toSeq

  test("keeps exactly the k smallest distinct values, sorted, regardless of partitioning") {
    val values = (1L to 500L).map(i => (i * 7919L) % 1009L)
    val expected = values.distinct.sorted.take(16)
    assert(minima(values, 16, 1) == expected)
    assert(minima(values, 16, 7) == expected) // merge path: same result
  }

  test("duplicate values do not occupy extra slots") {
    val values = Seq(5L, 5L, 5L, 1L, 1L, 9L, 3L, 3L)
    assert(minima(values, 3, 2) == Seq(1L, 3L, 5L))
  }

  test("below-k input IS the exact distinct set (exact-fallback arm)") {
    assert(minima(Seq(42L, 7L, 42L), 16, 2) == Seq(7L, 42L))
  }

  test("state never exceeds k entries") {
    assert(minima((1L to 10000L).toSeq, 4, 8) == Seq(1L, 2L, 3L, 4L))
  }

  test("grouped aggregation sketches each group independently") {
    val df = Seq(("a", 10L), ("a", 2L), ("a", 7L), ("b", 100L), ("b", 1L))
      .toDF("g", "hv")
    val out = df.groupBy(col("g")).agg(KmvSketch.kmvMinima(col("hv"), 2).as("m"))
      .orderBy(col("g")).collect()
    assert(out(0).getSeq[Long](1).toSeq == Seq(2L, 7L))
    assert(out(1).getSeq[Long](1).toSeq == Seq(1L, 100L))
  }
}
