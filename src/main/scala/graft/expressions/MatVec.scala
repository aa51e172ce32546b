package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense matrix × vector as ONE native expression — the pre-transform rung
  * of the PQ quality ladder (OPQ-style rotation, Ge et al. 2013 §II /
  * FAISS's RandomRotationMatrix pre-transform): out[j] = Σ_t M[j][t]·v[t].
  *
  * Native for the [[PqEncode]] reason: the Column composition needs
  * rows·cols literal nodes (4096 at a 64×64 rotation) — over the codegen
  * budget — so the matrix rides as a codegen reference object instead.
  *
  * Determinism contract (the oracle anchor): each output element accumulates
  * over `t` ascending (`acc += M[j][t]·v[t]`, IEEE left-assoc — bit-identical
  * to an unrolled `M[j][1]·v[1] + …` SQL chain). Null input array or element
  * → null; a vector length ≠ the matrix's column count raises (the
  * geometry-loudness rule shared by the PQ expression family).
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.length == matrix(0).length),
    "mat_vec needs a non-empty rectangular matrix")

  private def rows: Int = matrix.length
  private def cols: Int = matrix(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec expects array<float|double>, got ${other.sql}")
  }

  private def elemDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != cols) throw new IllegalArgumentException(
      s"mat_vec expects $cols-dim vectors, got $n")
    val out = new Array[Double](rows)
    var j = 0
    while (j < rows) {
      val row = matrix(j)
      var acc = 0.0
      var t = 0
      while (t < cols) {
        if (v.isNullAt(t)) return null
        val x = if (elemDouble) v.getDouble(t) else v.getFloat(t).toDouble
        acc += row(t) * x
        t += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val get = if (elemDouble) (a: String, i: String) => s"$a.getDouble($i)"
              else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val row = ctx.freshName("row")
      val acc = ctx.freshName("acc"); val t = ctx.freshName("t")
      val x = ctx.freshName("x")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin composed strings (q65 incident).
      s"""
         |int $n = $v.numElements();
         |if ($n != ${cols}) {
         |  throw new IllegalArgumentException("mat_vec expects ${cols}-dim vectors, got " + $n);
         |}
         |double[] $out = new double[${rows}];
         |outer: for (int $j = 0; $j < ${rows}; $j++) {
         |  double[] $row = $mRef[$j];
         |  double $acc = 0.0;
         |  for (int $t = 0; $t < ${cols}; $t++) {
         |    if ($v.isNullAt($t)) { ${ev.isNull} = true; break outer; }
         |    double $x = ${get(v, t)};
         |    $acc += $row[$t] * $x;
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = ${ev.isNull}
         |  ? null
         |  : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override def prettyName: String = "mat_vec"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MatVec {
  def apply(vec: Column, matrix: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      new MatVec(org.apache.spark.sql.graftbridge.ColumnBridge.expression(vec),
        matrix.map(_.toArray).toArray))
}
