package graft.expressions

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def randomishVecs(n: Int, d: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      // deterministic pseudo-random floats incl. negatives and exact zeros
      (i.toLong, Array.tabulate(d)(j =>
        if ((i + j) % 17 == 0) 0f
        else ((i * 31 + j * 7) % 1000 - 500) / 250.0f))
    }

  test("bit-exact parity with the HOF fold on float vectors") {
    val df = randomishVecs(200, 64).toDF("id", "v")
      .select(col("id"), col("v").as("a"),
        reverse(col("v")).as("b"))
    val both = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("hof"),
      NativeVec.dot(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof_cos"),
      NativeVec.cosine(col("a"), col("b")).as("native_cos")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)), s"dot mismatch: $r")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        == java.lang.Double.doubleToLongBits(r.getDouble(3)), s"cosine mismatch: $r")
    }
  }

  test("mixed float/double sides (query-vector literal) are exact too") {
    val q = Seq.tabulate(64)(j => (j % 9 - 4) / 3.0)
    val df = randomishVecs(50, 64).toDF("id", "v")
    val lit64 = array(q.map(lit): _*)
    val both = df.select(
      VectorFunctions.dot(col("v"), lit64).as("hof"),
      NativeVec.dot(col("v"), lit64).as("native")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null element poisons the product like zip_with; null array is null") {
    val df = Seq(
      (Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f)),
      (null, Array[java.lang.Float](1f, 2f, 3f)))
      .toDF("a", "b")
    val out = df.select(NativeVec.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("participates in whole-stage codegen (no CodegenFallback in plan)") {
    // spark.range source so the optimizer can't collapse to a LocalTableScan
    val vecs = spark.range(100).select(col("id"),
      transform(sequence(lit(0L), lit(7L)), j => (col("id") + j).cast("float")).as("v"))
    val df = vecs.select(NativeVec.dot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen stages in the simple plan string;
    // vec_dot's Project is starred (the HOF transform Project above it is not)
    assert(plan.split("\n").exists(l => l.trim.matches("""\*\(\d+\) Project \[vec_dot.*""")), plan)
    assert(df.filter(col("d") > 0).count() == 100) // runs through the generated loop
  }

  test("vec_dot registers for SQL (runtime registration on a live session)") {
    NativeVec.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
