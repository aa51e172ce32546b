package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All six Gopher repetition signals ([[graft.operators.RepetitionStats]])
  * fused into ONE native pass per document.
  *
  * The higher-order-function formulation builds the signals from ~40 chained
  * `transform`/`aggregate`/`zip_with`/`array_sort` expressions — every one
  * CodegenFallback, every intermediate a fresh boxed array, and the token
  * array re-walked once per signal. This expression computes the identical
  * integers in a single hand-written loop family (one split per segment
  * family, one hash-count per gram family, one coverage stamp per flag set)
  * and performs the same ONE IEEE double division per fraction at the end,
  * so the DuckDB oracle — and the HOF chain, spec-pinned — reproduce bits.
  *
  * Parity notes (each matching the HOF chain exactly):
  *   - lines/paras split the RAW text on `\n` / `\n\n` (Java regex,
  *     limit −1, trailing empties kept — `split`'s convention);
  *   - tokens are `split(trim(lower(text)), "\\s+")`: the lower/trim legs
  *     run on the [[UTF8String]] itself (same ASCII fast path and
  *     space-only trim as the built-ins), the split on the resulting
  *     string;
  *   - `length` = code points ([[UTF8String.numChars]]'s convention);
  *   - duplicate occurrences = `total − distinct` per segment family;
  *     duplicate characters = Σ (count−1)·len over values — exactly the
  *     sorted-adjacency sum;
  *   - the top gram is max count with ties to the smallest value in UTF-8
  *     BINARY order (`array_sort`'s string order, which the oracle replays
  *     with `ORDER BY cnt DESC, gram`);
  *   - n-gram character coverage is exact position coverage: token j is
  *     covered iff some flagged gram start i ∈ [j−n+1, j], overlaps
  *     counted once.
  *
  * Null text → null struct (the HOF chain nulls every signal column).
  */
case class RepetitionSignals(child: Expression, topN: Int, dupN: Int)
    extends UnaryExpression with CodegenFallback {

  require(topN >= 1 && dupN >= 1, s"gram sizes must be >= 1, got $topN/$dupN")

  override def dataType: DataType = RepetitionSignals.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_repetition_signals expects a string column, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val rawStr = raw.toString
    val lines = RepetitionSignals.NL.split(rawStr, -1)
    val paras = RepetitionSignals.NLNL.split(rawStr, -1)
    val (dlf, dlcf) = RepetitionSignals.dupFractions(lines)
    val (dpf, dpcf) = RepetitionSignals.dupFractions(paras)
    // the built-ins' exact leg order: lower (UTF8String ASCII fast path),
    // then space-only trim, then the Java-regex whitespace split
    val toks = RepetitionSignals.WS.split(raw.toLowerCase.trim.toString, -1)
    val top = RepetitionSignals.gramCoverage(toks, topN, topMode = true)
    val dup = RepetitionSignals.gramCoverage(toks, dupN, topMode = false)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dlf, dlcf, dpf, dpcf, top, dup))
  }

  override def prettyName: String = "graft_repetition_signals"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionSignals {

  val schema: StructType = StructType(Seq(
    "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
    "dup_para_char_frac", "top_gram_char_frac", "dup_gram_char_frac")
    .map(StructField(_, DoubleType, nullable = false)))

  private val NL = Pattern.compile("\n")
  private val NLNL = Pattern.compile("\n\n")
  private val WS = Pattern.compile("\\s+")

  /** Code points, the built-in `length`'s convention. */
  private def numChars(s: String): Long = s.codePointCount(0, s.length).toLong

  /** UTF-8 unsigned byte order — `array_sort`'s string order. Called on
    * top-gram ties only. */
  private def utf8Less(a: String, b: String): Boolean =
    graft.functions.TextFunctions.utf8Less(a, b)

  /** (duplicate fraction, duplicate CHARACTER fraction) of a segment family:
    * `(n − distinct) / n` and `Σ (count−1)·len / Σ len`, zero denominators
    * → 0.0 — [[graft.operators.RepetitionStats.dupSegmentFractions]]'s
    * integers with one division each. */
  private def dupFractions(segs: Array[String]): (Double, Double) = {
    val n = segs.length
    if (n == 0) return (0.0, 0.0)
    val counts = new java.util.HashMap[String, Int](n * 2)
    var totChars = 0L
    var i = 0
    while (i < n) {
      counts.merge(segs(i), 1, Integer.sum)
      totChars += numChars(segs(i))
      i += 1
    }
    var dupChars = 0L
    var distinct = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      distinct += 1
      if (e.getValue > 1) dupChars += (e.getValue - 1).toLong * numChars(e.getKey)
    }
    val frac = (n - distinct).toDouble / n.toDouble
    val charFrac = if (totChars == 0L) 0.0 else dupChars.toDouble / totChars.toDouble
    (frac, charFrac)
  }

  /** Character-coverage fraction of the flagged n-gram starts: `topMode`
    * flags occurrences of the single most frequent gram (ties to the
    * UTF-8-smallest value), otherwise every gram occurring ≥ 2 times.
    * Token j is covered iff some flagged start i ∈ [j−n+1, j]; covered
    * token characters / total token characters, 0.0 on an empty
    * denominator or a gram-less document. */
  private def gramCoverage(toks: Array[String], n: Int, topMode: Boolean): Double = {
    val t = toks.length
    if (t < n) return 0.0
    val g = t - n + 1
    val grams = new Array[String](g)
    val counts = new java.util.HashMap[String, Int](g * 2)
    var i = 0
    while (i < g) {
      val sb = new java.lang.StringBuilder(numCharsHint(toks, i, n))
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val gram = sb.toString
      grams(i) = gram
      counts.merge(gram, 1, Integer.sum)
      i += 1
    }
    val covered = new Array[Boolean](t)
    if (topMode) {
      var bestVal: String = null
      var best = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > best ||
          (e.getValue == best && utf8Less(e.getKey, bestVal))) {
          best = e.getValue; bestVal = e.getKey
        }
      }
      i = 0
      while (i < g) {
        if (grams(i) == bestVal) stamp(covered, i, n)
        i += 1
      }
    } else {
      i = 0
      while (i < g) {
        if (counts.get(grams(i)) >= 2) stamp(covered, i, n)
        i += 1
      }
    }
    var covChars = 0L
    var totChars = 0L
    i = 0
    while (i < t) {
      val len = numChars(toks(i))
      totChars += len
      if (covered(i)) covChars += len
      i += 1
    }
    if (totChars == 0L) 0.0 else covChars.toDouble / totChars.toDouble
  }

  private def stamp(covered: Array[Boolean], start: Int, n: Int): Unit = {
    var j = start
    val end = start + n
    while (j < end) { covered(j) = true; j += 1 }
  }

  private def numCharsHint(toks: Array[String], i: Int, n: Int): Int = {
    var h = n - 1
    var k = 0
    while (k < n) { h += toks(i + k).length; k += 1 }
    h
  }

  /** Column front door (SQL users get `graft_repetition_signals` via the
    * [[SqlFunctions.registry]]). */
  def signals(text: Column, topN: Int, dupN: Int): Column =
    ColumnBridge.column(RepetitionSignals(ColumnBridge.expression(text), topN, dupN))
}
