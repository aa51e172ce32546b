package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native dot product over `array<float|double>` columns with whole-stage codegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`,
  * [[graft.functions.VectorFunctions.dot]]) is CodegenFallback — interpreted per
  * row, with lambda-variable boxing per element. This expression generates a tight
  * primitive loop instead. Bit-exact parity with the HOF fold for equal-length,
  * null-free arrays: same left-to-right double accumulation
  * (`0.0 + t1 + … + tn`, and IEEE `0.0 + x == x`).
  *
  * Null semantics: null input → null; a null ELEMENT on either side → null
  * (matching `zip_with`'s null product poisoning the HOF sum). Lengths are
  * expected equal (embedding columns); the shorter length bounds the loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Nullable even for non-nullable inputs: a null ELEMENT nulls the result.
    * Without this override, non-nullable children make codegen bind `ev.isNull`
    * to the literal `false`, the generated `isNull = true` assignment fails to
    * compile, and the whole predicate silently falls back to interpreted
    * evaluation — the exact regression this expression exists to avoid. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val leftDouble = elemType(left) == DoubleType
    val rightDouble = elemType(right) == DoubleType
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val av = if (leftDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val bv = if (rightDouble) b.getDouble(i) else b.getFloat(i).toDouble
      sum += av * bv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, e: Expression): String =
      if (elemType(e) == DoubleType) s"$arr.getDouble($i)"
      else s"((double) $arr.getFloat($i))"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += ${get(l, i, left)} * ${get(r, i, right)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door for the native expressions. */
object NativeVec {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine with the same operation shape as [[graft.functions.VectorFunctions.cosine]]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Register `vec_dot` for SQL use on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      exprs => VecDot(exprs.head, exprs(1)))
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` registers the
  * whole [[SqlFunctions]] surface (native expressions, sketch aggregates, and
  * the `graft_`-prefixed text/dedup/URL compositions) for SQL users AND the
  * [[graft.plans.GroupTopKStrategy]] planner strategy, so on a cluster the
  * whole library is installed by config — no code-side session mutation
  * (the Column/operator APIs still self-register when called directly). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    SqlFunctions.registry.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    // no session exists at injection time; `SparkSession.active` is evaluated
    // lazily inside the analyzing session's `withActive` scope (see
    // SqlFunctions.tableRegistry scaladoc)
    SqlFunctions.tableRegistry(() => org.apache.spark.sql.SparkSession.active)
      .foreach { case (name, cls, builder) =>
      ext.injectTableFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
  }
}
