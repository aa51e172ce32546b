package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0))

  test("generated code COMPILES — no silent interpreter fallback") {
    // GenerateUnsafeProjection.generate (unlike UnsafeProjection.create) has
    // no fallback: a codegen syntax error throws instead of degrading to
    // interpreted eval. Regression for the stripMargin-eaten '||' that left
    // q65 interpreted for a whole round, and — via the doubled instance —
    // for local names (takes/x/c) that were not freshName'd and would
    // collide when two NearestCentroid calls share one generated method.
    val in = BoundReference(0, ArrayType(DoubleType, containsNull = true),
      nullable = true)
    val e1 = new NearestCentroid(in, cents.map(_.toArray).toArray)
    val e2 = new NearestCentroid(in, Array(Array(0.5, 0.5)))
    val proj = GenerateUnsafeProjection.generate(Seq(e1, e2), Nil)
    val row = proj(InternalRow(ArrayData.toArrayData(Array(3.0, 4.0))))
    assert(row.getInt(0) == 1) // cos vs (0,1) = 0.8 beats 0.6 and -0.6
    assert(row.getInt(1) == 0)
  }

  test("codegen and interpreted eval agree, incl. NaN and null-element rows") {
    val rows: Seq[(Long, Option[Seq[Option[Double]]])] = Seq(
      1L -> Some(Seq(Some(3.0), Some(4.0))),
      2L -> Some(Seq(Some(-2.0), Some(0.5))),
      3L -> Some(Seq(Some(Double.NaN), Some(1.0))),
      4L -> Some(Seq(Some(0.0), Some(0.0))), // zero norm -> NaN scores
      5L -> Some(Seq(None, Some(1.0))),      // null element -> null
      6L -> None)                            // null array -> null
    val df = rows.toDF("id", "v")
    val expr = NearestCentroid(col("v"), cents)
    val viaCodegen = df.select(col("id"), expr.as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    // force the interpreted path through nullSafeEval directly
    val native = new NearestCentroid(
      BoundReference(0, ArrayType(DoubleType, true), true),
      cents.map(_.toArray).toArray)
    val viaInterp = rows.map { case (id, v) =>
      id -> (v match {
        case Some(xs) if xs.forall(_.isDefined) =>
          native.nullSafeEval(ArrayData.toArrayData(xs.map(_.get).toArray))
        case _ => null
      })
    }.toMap
    assert(viaCodegen == viaInterp, s"codegen=$viaCodegen interp=$viaInterp")
    // NaN compares greatest, ties take the larger index (greatest-struct rule)
    assert(viaCodegen(3L) == cents.length - 1)
    assert(viaCodegen(4L) == cents.length - 1)
  }
}
