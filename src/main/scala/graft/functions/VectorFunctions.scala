package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns as pure column
  * expressions (codegen'd higher-order functions — no UDF, no shuffle).
  *
  * Every lambda casts elements to double BEFORE multiplying so the operation
  * sequence is plain left-to-right double arithmetic: bit-for-bit reproducible and
  * exactly mirrorable in an unrolled SQL oracle expression (IEEE: `0.0 + x == x`,
  * and a left fold equals an explicit `t1 + t2 + … + tn` chain).
  */
object VectorFunctions {

  /** Σ a_i * b_i with double accumulation in array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ a_i², double. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity: dot / (sqrt(|a|²) * sqrt(|b|²)). NaN when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Squared Euclidean distance, double accumulation in array order. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
}
