package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization encoder (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split the vector into `m` contiguous subvectors
  * and emit, per subspace, the index of the L2-nearest centroid from that
  * subspace's codebook — ONE native expression with the m×ksub×dsub codebook
  * matrix embedded as a codegen reference object.
  *
  * This is a native expression for the same reason as [[NearestCentroid]]:
  * the Column-composition formulation needs m·ksub·dsub literal nodes
  * (8·16·8 = 1024 at the default geometry), which blows the codegen budget
  * and drops the stage to interpreted evaluation. Downstream PQ math (code
  * packing, ADC lookup sums) stays composed from built-ins — it touches only
  * m·ksub values, well inside the budget.
  *
  * Determinism contract (the oracle anchor): per subspace the squared-L2
  * distance accumulates over dimensions in ascending order
  * (`d2 += diff*diff`, IEEE left-assoc chain — bit-identical to an unrolled
  * `(a-b)*(a-b) + …` SQL chain), and argmin ties take the LOWER centroid
  * index (strict `<`), matching `row_number() OVER (ORDER BY dist, cid)`.
  * NaN distances never win (NaN < x is false); an all-NaN row keeps index 0.
  *
  * Output: array<int> of length m (containsNull=false). Null input array, or
  * any null element, → null (same rationale as [[VecDot.nullable]]). A
  * vector whose length differs from m·dsub RAISES (eval + codegen): a
  * corpus/codebook geometry mismatch would otherwise tie every trailing
  * subspace at d2=0 and emit plausible-looking wrong codes — same loudness
  * discipline as [[PqResidualEncode]]'s cell-range check.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one centroid per subspace")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // a null ELEMENT nulls the result even for a non-nullable input column
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  private def elemDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    // loud geometry check (the PqResidualEncode cell-range discipline): a
    // mismatched corpus would otherwise tie every trailing subspace at d2=0
    // and emit plausible-looking code 0s instead of an error
    if (n != m * dsub) throw new IllegalArgumentException(
      s"pq_encode expects ${m * dsub}-dim vectors (m=$m × dsub=$dsub), got $n")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cents = codebooks(s)
      val off = s * dsub
      var bi = 0
      var best = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d2 = 0.0
        var t = 0
        while (t < dsub) {
          if (v.isNullAt(off + t)) return null
          val x = if (elemDouble) v.getDouble(off + t) else v.getFloat(off + t).toDouble
          val diff = x - cent(t)
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
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val get = if (elemDouble) (a: String, i: String) => s"$a.getDouble($i)"
              else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val cents = ctx.freshName("cents")
      val off = ctx.freshName("off"); val bi = ctx.freshName("bi")
      val best = ctx.freshName("best"); val c = ctx.freshName("c")
      val cent = ctx.freshName("cent"); val d2 = ctx.freshName("d2")
      val t = ctx.freshName("t")
      val x = ctx.freshName("x"); val diff = ctx.freshName("diff")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin their composed strings (see the
      // NearestCentroid q65 incident).
      s"""
         |int $n = $v.numElements();
         |if ($n != ${m * dsub}) {
         |  throw new IllegalArgumentException("pq_encode expects ${m * dsub}-dim vectors (m=${m} x dsub=${dsub}), got " + $n);
         |}
         |int $s = 0;
         |int[] $codes = new int[${m}];
         |outer: while ($s < ${m}) {
         |  double[][] $cents = $cbRef[$s];
         |  int $off = $s * ${dsub};
         |  int $bi = 0;
         |  double $best = java.lang.Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    double[] $cent = $cents[$c];
         |    double $d2 = 0.0;
         |    for (int $t = 0; $t < ${dsub}; $t++) {
         |      if ($v.isNullAt($off + $t)) { ${ev.isNull} = true; break outer; }
         |      double $x = ${get(v, s"($off + $t)")};
         |      double $diff = $x - $cent[$t];
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

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(new PqEncode(ColumnBridge.expression(vec),
      codebooks.map(_.map(_.toArray).toArray).toArray))
}
