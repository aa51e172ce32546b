package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** SYMMETRIC distance computation (SDC, Jégou et al. 2011 §III.A) between
  * two PACKED PQ codes: d²(a, b) ≈ Σ_s table(s)[code_a(s)·ksub + code_b(s)],
  * where table(s)[i·ksub + j] = L2²(codebook(s)(i), codebook(s)(j)) is
  * precomputed ONCE from the codebooks.
  *
  * This is what makes corpus×corpus workloads (k-NN graph construction)
  * scale-safe: the asymmetric (ADC) batch path must materialize an m×ksub
  * LUT per (query, probe) pair — a LUT column the size of the corpus itself
  * when the corpus IS the query table (≈16 KB/row at 8×256: terabytes of
  * shuffle at 10⁹ nodes). SDC replaces all of it with ONE m·ksub² reference
  * table (4 MB at 8×256, shipped once per executor inside the codegen
  * references) and 8-byte codes on BOTH join sides. The price is accuracy —
  * both sides are quantized, so SDC recall ≤ ADC recall (ibid., Table 1) —
  * which an exact or ADC refine stage recovers; measured honestly in
  * r11_knn_graph.
  *
  * Children: two packed codes (long). The table rides as a codegen reference
  * object (`double[m][ksub·ksub]` — the [[PqEncode]] budget rationale: m·ksub²
  * literals would explode the plan). Codes unpack as
  * `(packed >>> s·width) & (2^width − 1)` — [[graft.operators.
  * ProductQuantization.unpackCode]]'s layout; `width` is passed in by the
  * operator side so the bit layout has exactly one owner.
  *
  * Determinism contract: table entries accumulate dimensions ascending
  * (left-assoc `d2 += diff·diff` — built by `sdcTables`, replayed by the
  * oracle's unrolled chains), and the final sum runs subspaces ascending
  * left-assoc. Null code on either side → null; an unpacked code ≥ ksub
  * raises loudly (garbage input, not a ranking).
  */
case class PqSdcDistance(left: Expression, right: Expression,
                         table: Array[Array[Double]],
                         ksub: Int, width: Int)
    extends BinaryExpression {

  require(table.nonEmpty, "pq_sdc_distance needs at least one subspace table")
  require(table.forall(_.length == ksub * ksub),
    s"every subspace table must hold ksub²=${ksub * ksub} entries")
  require(width > 0 && table.length * width <= 64,
    s"m=${table.length} codes of $width bits exceed one packed long")

  private def m: Int = table.length
  private val mask: Long = (1L << width) - 1

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_sdc_distance expects (bigint, bigint) packed codes, got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(aIn: Any, bIn: Any): Any = {
    val a = aIn.asInstanceOf[Long]
    val b = bIn.asInstanceOf[Long]
    var dist = 0.0
    var s = 0
    while (s < m) {
      val ca = ((a >>> (s * width)) & mask).toInt
      val cb = ((b >>> (s * width)) & mask).toInt
      if (ca >= ksub || cb >= ksub) throw new IllegalArgumentException(
        s"unpacked code ($ca, $cb) at subspace $s outside ksub=$ksub — not a packed code")
      dist += table(s)(ca * ksub + cb)
      s += 1
    }
    dist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("sdcTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dist = ctx.freshName("dist"); val s = ctx.freshName("s")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin composed strings (q65 incident).
      s"""
         |double $dist = 0.0;
         |for (int $s = 0; $s < ${m}; $s++) {
         |  int $ca = (int) (($a >>> ($s * ${width})) & ${mask}L);
         |  int $cb = (int) (($b >>> ($s * ${width})) & ${mask}L);
         |  if ($ca >= ${ksub} || $cb >= ${ksub}) {
         |    throw new IllegalArgumentException("unpacked code (" + $ca + ", " + $cb +
         |      ") at subspace " + $s + " outside ksub=${ksub} - not a packed code");
         |  }
         |  $dist += $tRef[$s][$ca * ${ksub} + $cb];
         |}
         |${ev.value} = $dist;
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_sdc_distance"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqSdcDistance {
  def apply(a: Column, b: Column, table: Array[Array[Double]],
            ksub: Int, width: Int): Column =
    ColumnBridge.column(new PqSdcDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b), table, ksub, width))
}
