package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Membership test of a long against a SORTED constant long array, as one
  * codegen'd `Arrays.binarySearch` — O(log n) per row where
  * `array_contains(lit(...), x)` is a linear scan of the literal per row.
  *
  * This is the plan shape that keeps broadcast-set rewrites linear in the
  * corpus: [[graft.operators.LineDedup.removeRepeatedLines]]'s zero-shuffle
  * path checks every corpus line against the boilerplate set, and the linear
  * literal scan made that L·B work — measured 69× per data decade (594 s at
  * ×1000 corpus) before this expression; binary search restores L·log B.
  *
  * The set rides into generated code as a reference object (one `long[]` per
  * task, not per row). Null input → null. The array MUST be sorted ascending
  * (callers sort once on the driver); duplicates are harmless.
  */
case class SortedLongSetContains(child: Expression, sorted: Array[Long])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sorted_long_set_contains expects a bigint input, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    java.util.Arrays.binarySearch(sorted, v.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.util.Arrays.binarySearch($arr, $c) >= 0;")
  }

  override def prettyName: String = "sorted_long_set_contains"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortedLongSetContains {
  /** Column front door; sorts a defensive copy once on the driver. */
  def contains(x: Column, set: Array[Long]): Column = {
    val s = set.clone()
    java.util.Arrays.sort(s)
    ColumnBridge.column(SortedLongSetContains(ColumnBridge.expression(x), s))
  }
}
