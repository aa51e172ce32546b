package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Index of the nearest centroid by cosine — the IVF coarse-quantizer
  * assignment, as ONE native expression over the embedding column with the
  * k×dims centroid matrix embedded as a codegen reference object.
  *
  * The Column-composition formulation (`greatest` over k `struct(cosine(vec,
  * vecLit(c)), i)` branches) builds a k·dims-literal expression tree: at
  * k=16, dims=64 that is ~1k `CreateArray` literals whose generated method
  * blows the JIT/codegen budget and drops the whole stage to interpreted
  * evaluation — measured minutes per pass on a 200k-row corpus where this
  * expression takes well under a second. Same score arithmetic as
  * [[NativeVec.cosine]] (`dot / (sqrt(vv) · sqrt(cc))`, centroid norms
  * precomputed) and the same selection rule as the greatest-struct tree:
  * NaN compares greatest (Spark double ordering), score ties pick the
  * LARGER index. Null input array, or any null element, → null.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")

  override def dataType: DataType = IntegerType

  // a null ELEMENT nulls the result even for a non-nullable input column —
  // same override rationale as VecDot.nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got ${other.sql}")
  }

  private def elemDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Spark double ordering: NaN is greatest (and equal to itself); ties take
    * the later (larger) index, matching `greatest` over (score, idx) structs. */
  private def takes(score: Double, best: Double): Boolean =
    if (java.lang.Double.isNaN(score)) true
    else if (java.lang.Double.isNaN(best)) false
    else score >= best

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (elemDouble) v.getDouble(i) else v.getFloat(i).toDouble
      vv += x * x
      i += 1
    }
    val sv = math.sqrt(vv)
    var bi = 0
    var best = Double.NegativeInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var t = 0
      while (t < m) {
        val x = if (elemDouble) v.getDouble(t) else v.getFloat(t).toDouble
        d += x * c(t)
        t += 1
      }
      val score = d / (sv * norms(j))
      if (j == 0 || takes(score, best)) { best = score; bi = j }
      j += 1
    }
    bi
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nRef = ctx.addReferenceObj("norms", norms, "double[]")
    val get = if (elemDouble) (a: String, i: String) => s"$a.getDouble($i)"
              else (a: String, i: String) => s"((double) $a.getFloat($i))"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val vv = ctx.freshName("vv")
      val sv = ctx.freshName("sv"); val best = ctx.freshName("best")
      val bi = ctx.freshName("bi"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val m = ctx.freshName("m")
      val score = ctx.freshName("score"); val x = ctx.freshName("x")
      val c = ctx.freshName("c"); val takes = ctx.freshName("takes")
      // CAUTION: no generated line may BEGIN (after whitespace) with '|' —
      // outer codegen templates stripMargin their composed strings, which
      // silently ate a line-leading '||' here (q65 fell back to interpreted
      // eval for a full round before the fallback was noticed).
      s"""
         |int $n = $v.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${get(v, i)};
         |  $vv += $x * $x;
         |}
         |int $bi = 0;
         |if (!${ev.isNull}) {
         |  double $sv = java.lang.Math.sqrt($vv);
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $cRef.length; $j++) {
         |    double[] $c = $cRef[$j];
         |    int $m = java.lang.Math.min($n, $c.length);
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $m; $t++) { $d += ${get(v, t)} * $c[$t]; }
         |    double $score = $d / ($sv * $nRef[$j]);
         |    boolean $takes = java.lang.Double.isNaN($score) ||
         |      (!java.lang.Double.isNaN($best) && $score >= $best);
         |    if ($j == 0 || $takes) { $best = $score; $bi = $j; }
         |  }
         |}
         |${ev.value} = $bi;
       """.stripMargin
    })
  }

  override def prettyName: String = "nearest_centroid"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(new NearestCentroid(ColumnBridge.expression(vec),
      centroids.map(_.toArray).toArray))
}
