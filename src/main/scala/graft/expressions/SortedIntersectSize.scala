package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED long arrays, as one codegen'd two-pointer merge.
  *
  * The dedup verify stages (ngramJaccardPairs / ngramContainmentPairs) hold
  * per-doc gram sets as sorted distinct xxhash64 arrays and only need the
  * INTERSECTION SIZE per candidate pair. The built-in
  * `size(array_intersect(a, b))` allocates a hash set plus the materialized
  * intersection array per row — per-row allocation on exactly the hot path
  * (SCALE.md records it measuring 2× slower than a shuffle when used for
  * emit-once). The merge walk allocates nothing and exits in
  * O(|A| + |B|) long comparisons.
  *
  * Inputs MUST be sorted ascending with distinct elements (what
  * `array_sort(array_distinct(...))` produces) — unsorted inputs undercount,
  * by the same contract family as the sorted-run fold in
  * [[graft.functions.TextFunctions.maxRunLength]]. Null array → null; null
  * ELEMENTS are skipped (they sort nowhere in a long merge and the gram
  * pipeline never produces them).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects array<bigint> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val av = a.getLong(i)
        val bv = b.getLong(j)
        if (av == bv) { c += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      s"""
         |int $na = $l.numElements();
         |int $nb = $r.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $na && $j < $nb) {
         |  if ($l.isNullAt($i)) { $i++; }
         |  else if ($r.isNullAt($j)) { $j++; }
         |  else {
         |    long $av = $l.getLong($i);
         |    long $bv = $r.getLong($j);
         |    if ($av == $bv) { $c++; $i++; $j++; }
         |    else if ($av < $bv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override def prettyName: String = "sorted_intersect_size"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door. */
object NativeArr {
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
