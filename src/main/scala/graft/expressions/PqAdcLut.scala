package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-(query, cell) ADC lookup table as ONE native expression — the batch
  * twin of [[graft.operators.ProductQuantization.residualAdcLut]]: for a
  * query vector and a probed coarse cell, emit the FLATTENED m×ksub table
  * lut[s·ksub + c] = L2²((q − coarse(cell))_s, codebook(s)(c)), the table an
  * ADC scan then reads with m `element_at` lookups per row
  * ([[graft.operators.ProductQuantization.adcDistanceFromLutCol]]).
  *
  * This is what makes query-TABLE IVFADC search scale-safe: the single-query
  * path builds its LUTs on the driver, but a batch of a million queries ×
  * nprobe cells needs a LUT per (query, cell) PAIR — as a data column
  * computed in-scan (m·ksub·dsub flops per pair, once), never as literal
  * plan nodes (which would grow the plan by m·ksub literals per pair).
  *
  * Children: (vec: array<float|double>, cell: int). The kCent×dims coarse
  * matrix and m×ksub×dsub codebooks ride as codegen reference objects (the
  * [[PqEncode]] budget rationale). A coarse centroid SHORTER than the vector
  * is zero-extended — pass a single empty centroid with cell 0 for the PLAIN
  * (non-residual) table, whose chain `(q[j] − 0.0) − cb[t]` is IEEE-identical
  * to `q[j] − cb[t]` ([[graft.operators.ProductQuantization.adcLut]]).
  *
  * Determinism contract: per (s, c) the squared-L2 accumulates over
  * dimensions ascending (`d2 += diff·diff`, left-assoc), entries emitted in
  * (s asc, c asc) order — bit-identical to the driver-side builders the
  * oracle replays. Null vec / element / cell → null; cell out of range or a
  * vector length ≠ m·dsub raises (the [[PqResidualEncode]] loudness rule).
  */
case class PqAdcLut(left: Expression, right: Expression,
                    coarse: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(coarse.nonEmpty, "pq_adc_lut needs coarse centroids")
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc_lut needs at least one centroid per subspace")

  private def m: Int = codebooks.length
  private def ksub: Int = codebooks(0).length
  private def dsub: Int = codebooks(0)(0).length

  require(codebooks.forall(_.length == ksub),
    "pq_adc_lut needs the same centroid count in every subspace")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_lut expects (array<float|double>, int), got (${l.sql}, ${r.sql})")
  }

  private def elemDouble: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(vecIn: Any, cellIn: Any): Any = {
    val v = vecIn.asInstanceOf[ArrayData]
    val cell = cellIn.asInstanceOf[Int]
    require(cell >= 0 && cell < coarse.length,
      s"cell $cell outside coarse matrix of ${coarse.length}")
    val cen = coarse(cell)
    val n = v.numElements()
    if (n != m * dsub) throw new IllegalArgumentException(
      s"pq_adc_lut expects ${m * dsub}-dim vectors (m=$m × dsub=$dsub), got $n")
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      val off = s * dsub
      var c = 0
      while (c < ksub) {
        val cb = cents(c)
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          if (v.isNullAt(off + t)) return null
          val x = if (elemDouble) v.getDouble(off + t) else v.getFloat(off + t).toDouble
          val ce = if (off + t < cen.length) cen(off + t) else 0.0
          val diff = (x - ce) - cb(t)
          d2 += diff * diff
          t += 1
        }
        lut(s * ksub + c) = d2
        c += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val get = if (elemDouble) (a: String, i: String) => s"$a.getDouble($i)"
              else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val n = ctx.freshName("n"); val lut = ctx.freshName("lut")
      val cen = ctx.freshName("cen"); val s = ctx.freshName("s")
      val cents = ctx.freshName("cents"); val off = ctx.freshName("off")
      val c = ctx.freshName("c"); val cb = ctx.freshName("cb")
      val d2 = ctx.freshName("d2"); val t = ctx.freshName("t")
      val x = ctx.freshName("x")
      val ce = ctx.freshName("ce"); val diff = ctx.freshName("diff")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin composed strings (q65 incident).
      s"""
         |if ($cell < 0 || $cell >= $coRef.length) {
         |  throw new IllegalArgumentException("cell " + $cell +
         |    " outside coarse matrix of " + $coRef.length);
         |}
         |double[] $cen = $coRef[$cell];
         |int $n = $v.numElements();
         |if ($n != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_adc_lut expects ${m * dsub}-dim vectors (m=${m} x dsub=${dsub}), got " + $n);
         |}
         |double[] $lut = new double[${m * ksub}];
         |int $s = 0;
         |outer: while ($s < ${m}) {
         |  double[][] $cents = $cbRef[$s];
         |  int $off = $s * ${dsub};
         |  for (int $c = 0; $c < ${ksub}; $c++) {
         |    double[] $cb = $cents[$c];
         |    double $d2 = 0.0;
         |    for (int $t = 0; $t < ${dsub}; $t++) {
         |      if ($v.isNullAt($off + $t)) { ${ev.isNull} = true; break outer; }
         |      double $x = ${get(v, s"($off + $t)")};
         |      double $ce = ($off + $t < $cen.length) ? $cen[$off + $t] : 0.0;
         |      double $diff = ($x - $ce) - $cb[$t];
         |      $d2 += $diff * $diff;
         |    }
         |    $lut[$s * ${ksub} + $c] = $d2;
         |  }
         |  $s++;
         |}
         |${ev.value} = ${ev.isNull}
         |  ? null
         |  : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($lut);
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_adc_lut"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcLut {
  /** Residual (true-IVFADC) table for (query, cell). */
  def apply(vec: Column, cell: Column, coarse: Seq[Seq[Double]],
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(new PqAdcLut(
      ColumnBridge.expression(vec), ColumnBridge.expression(cell),
      coarse.map(_.toArray).toArray,
      codebooks.map(_.map(_.toArray).toArray).toArray))

  /** PLAIN (non-residual) table: the zero-extended empty centroid makes the
    * residual chain collapse to `q[j] − cb[t]` bit-identically. */
  def plain(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    apply(vec, org.apache.spark.sql.functions.lit(0), Seq(Seq.empty), codebooks)
}
