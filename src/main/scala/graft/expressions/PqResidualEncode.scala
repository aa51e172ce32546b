package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** RESIDUAL product-quantization encoder — the true FAISS IVFADC layout
  * (Jégou et al. 2011 §IV.A): quantize `vec − coarseCentroid(cell)` instead
  * of the raw vector. Residuals concentrate around zero with far smaller
  * per-cell variance than the raw corpus, so the same m×ksub codebook
  * budget spends its capacity on the part of the vector the coarse
  * quantizer didn't already explain — measurably better ADC ranking at
  * identical code bytes.
  *
  * Children: (vec: array<float|double>, cell: int — the row's coarse cell,
  * [[graft.operators.SimilaritySearch.assignCells]]). The kCent×dims coarse
  * matrix and the m×ksub×dsub codebooks ride as codegen reference objects
  * (same budget rationale as [[PqEncode]]). Determinism contract matches
  * [[PqEncode]]: ascending-dimension L2 chains over the residual
  * (`(x − c[off+t]) − cb[t]`, two IEEE subtractions in that order), argmin
  * ties to the LOWER index. Null vec / null element / null cell → null;
  * a cell outside the coarse matrix is an error by construction (encode is
  * only called on assignCells output — a raise keeps index corruption loud).
  */
case class PqResidualEncode(left: Expression, right: Expression,
                            coarse: Array[Array[Double]],
                            codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  require(coarse.nonEmpty, "pq_residual_encode needs coarse centroids")
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_residual_encode needs at least one centroid per subspace")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_residual_encode expects (array<float|double>, int), got (${l.sql}, ${r.sql})")
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
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      val off = s * dsub
      var bi = 0
      var best = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cb = cents(c)
        var d2 = 0.0
        var t = 0
        val lim = math.min(dsub, math.max(0, n - off))
        while (t < lim) {
          if (v.isNullAt(off + t)) return null
          val x = if (elemDouble) v.getDouble(off + t) else v.getFloat(off + t).toDouble
          val ce = if (off + t < cen.length) cen(off + t) else 0.0
          val diff = (x - ce) - cb(t)
          d2 += diff * diff
          t += 1
        }
        if (c == 0 || d2 < best) { best = d2; bi = c }
        c += 1
      }
      codes(s) = bi
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val get = if (elemDouble) (a: String, i: String) => s"$a.getDouble($i)"
              else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val n = ctx.freshName("n"); val codes = ctx.freshName("codes")
      val cen = ctx.freshName("cen"); val s = ctx.freshName("s")
      val cents = ctx.freshName("cents"); val off = ctx.freshName("off")
      val bi = ctx.freshName("bi"); val best = ctx.freshName("best")
      val c = ctx.freshName("c"); val cb = ctx.freshName("cb")
      val d2 = ctx.freshName("d2"); val t = ctx.freshName("t")
      val lim = ctx.freshName("lim"); val x = ctx.freshName("x")
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
         |int $s = 0;
         |int[] $codes = new int[${m}];
         |outer: while ($s < ${m}) {
         |  double[][] $cents = $cbRef[$s];
         |  int $off = $s * ${dsub};
         |  int $bi = 0;
         |  double $best = java.lang.Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    double[] $cb = $cents[$c];
         |    double $d2 = 0.0;
         |    int $lim = java.lang.Math.min(${dsub}, java.lang.Math.max(0, $n - $off));
         |    for (int $t = 0; $t < $lim; $t++) {
         |      if ($v.isNullAt($off + $t)) { ${ev.isNull} = true; break outer; }
         |      double $x = ${get(v, s"($off + $t)")};
         |      double $ce = ($off + $t < $cen.length) ? $cen[$off + $t] : 0.0;
         |      double $diff = ($x - $ce) - $cb[$t];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($c == 0 || $d2 < $best) { $best = $d2; $bi = $c; }
         |  }
         |  $codes[$s] = $bi;
         |  $s++;
         |}
         |${ev.value} = ${ev.isNull}
         |  ? null
         |  : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override def prettyName: String = "pq_residual_encode"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqResidualEncode {
  def apply(vec: Column, cell: Column, coarse: Seq[Seq[Double]],
            codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(new PqResidualEncode(
      ColumnBridge.expression(vec), ColumnBridge.expression(cell),
      coarse.map(_.toArray).toArray,
      codebooks.map(_.map(_.toArray).toArray).toArray))
}
