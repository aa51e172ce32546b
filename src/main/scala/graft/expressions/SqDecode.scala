package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** SQ8 decode as ONE native expression: packed 8-codes-per-long →
  * dec_d = min_d + (code_d · span_d) / 255 (the affine inverse of
  * `ScalarQuantization.sqEncode`).
  *
  * Native for the [[PqEncode]] reason, found the hard way: the composed
  * built-in form is 64 static terms (element_at + shifts + affine each),
  * which grew one generated method past Janino's 64 KB limit under
  * CODEGEN_ONLY — the repo's codegen-only sweep caught it. Here the loop is
  * ~12 lines of generated code at any dimensionality, and the [min, max]
  * bounds ride as codegen reference objects.
  *
  * Determinism contract (the q135 oracle anchor): per dimension exactly
  * `mn + (code·(max − min))/255` in that association — the same IEEE
  * subtraction and chain the oracle performs on the same doubles. Null
  * packed array or a null packed GROUP → null (poisoning resolves at the
  * distance, the family contract). A packed length that disagrees with the
  * bounds raises loudly. */
case class SqDecode(child: Expression,
                    mins: Array[Double], maxs: Array[Double])
    extends UnaryExpression {

  require(mins.nonEmpty && mins.length == maxs.length,
    "sq_decode needs equal-length non-empty bounds")

  private def dims: Int = mins.length
  private def groups: Int = (dims + 7) / 8

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_decode expects array<bigint> packed codes, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val packed = input.asInstanceOf[ArrayData]
    if (packed.numElements() != groups) throw new IllegalArgumentException(
      s"sq_decode expects $groups packed longs for $dims dims, got ${packed.numElements()}")
    val out = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      val g = d / 8
      if (packed.isNullAt(g)) return null
      val code = ((packed.getLong(g) >>> ((d % 8) * 8)) & 0xffL).toDouble
      out(d) = mins(d) + (code * (maxs(d) - mins(d))) / 255.0
      d += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mins", mins, "double[]")
    val mxRef = ctx.addReferenceObj("maxs", maxs, "double[]")
    nullSafeCodeGen(ctx, ev, p => {
      val out = ctx.freshName("out"); val d = ctx.freshName("d")
      val g = ctx.freshName("g"); val code = ctx.freshName("code")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin composed strings (q65 incident).
      s"""
         |if ($p.numElements() != ${groups}) {
         |  throw new IllegalArgumentException("sq_decode expects ${groups} packed longs for ${dims} dims, got " + $p.numElements());
         |}
         |double[] $out = new double[${dims}];
         |for (int $d = 0; $d < ${dims}; $d++) {
         |  int $g = $d / 8;
         |  if ($p.isNullAt($g)) { ${ev.isNull} = true; break; }
         |  double $code = (double) (($p.getLong($g) >>> (($d % 8) * 8)) & 255L);
         |  $out[$d] = $mnRef[$d] + ($code * ($mxRef[$d] - $mnRef[$d])) / 255.0;
         |}
         |${ev.value} = ${ev.isNull}
         |  ? null
         |  : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override def prettyName: String = "sq_decode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqDecode {
  def apply(packed: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    ColumnBridge.column(new SqDecode(
      ColumnBridge.expression(packed), mins.toArray, maxs.toArray))
}
