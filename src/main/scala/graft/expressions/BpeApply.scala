package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** The trained BPE tokenizer model as a serializable codegen reference object:
  * the ordered merge table plus (optionally) the symbol→id vocabulary. This is
  * the BPE analog of [[PqEncode]]'s codebook matrix — the model is vocab-sized
  * (it IS the tokenizer), so it ships once per plan, never as per-row data or
  * plan literals.
  *
  * Encoding semantics — SEQUENTIAL learn-order replay (Sennrich et al. 2016's
  * `apply_bpe`): for each merge in merge_idx order, fuse every occurrence of
  * (left, right) in the symbol sequence greedily left-to-right,
  * non-overlapping. This is exactly the fold [[graft.operators.BpeTrainer
  * .trainMerges]] applies during training, so encoding the training corpus
  * reproduces the training-table state — the property the q136 oracle pins
  * (DuckDB replays the training rounds and reads the symbols off the final
  * round's table). The common rank-map formulation ("repeatedly merge the
  * lowest-ranked pair present") coincides with this whenever merged strings
  * are distinct; sequential replay is the definition here because it needs no
  * such caveat.
  *
  * Scale shape: per merge, a symbol-presence hash check skips the O(len) fuse
  * scan unless BOTH sides occur in the word — with a production-sized merge
  * table (~32k) a typical word triggers a handful of scans, so the cost is
  * O(|merges|) hash probes, not O(|merges|·len). On top rides a bounded
  * per-JVM memo cache keyed by pre-token: corpus word frequencies are
  * Zipf-distributed, so at 100 TB almost every encode is a cache hit (the
  * same distinct-words-not-corpus-words trick that makes training feasible).
  */
final class BpeCodec(
    val merges: Array[Array[String]],
    val vocabSyms: Array[String],
    val vocabIds: Array[Int],
    val oovId: Int = BpeCodec.Loud) extends Serializable {

  require(merges.forall(m => m.length == 3 && m(0).nonEmpty && m(1).nonEmpty
      && m(2) == m(0) + m(1)),
    "merges rows must be (left, right, left+right) with non-empty sides")
  require(vocabSyms.length == vocabIds.length,
    s"vocab arrays disagree: ${vocabSyms.length} syms vs ${vocabIds.length} ids")

  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocabSyms.length * 2)
    var i = 0
    while (i < vocabSyms.length) {
      // duplicate strings keep the LOWEST id — same rule as the vocab builder
      val prev = m.get(vocabSyms(i))
      if (prev == null || vocabIds(i) < prev.intValue) m.put(vocabSyms(i), vocabIds(i))
      i += 1
    }
    m
  }

  // Zipf memo: distinct pre-tokens are tiny relative to corpus occurrences.
  // ConcurrentHashMap because local-mode tasks share the JVM; cleared (not
  // evicted — no hot-path bookkeeping) at the cap, which a natural-language
  // vocabulary never reaches.
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val CacheCap = 1 << 20

  // wholesale-clear counter: a natural-language vocabulary never reaches the
  // cap, so any nonzero count means an adversarial (>1M distinct pre-tokens
  // per JVM) corpus regime where the memo hit rate collapses — observable
  // via this counter and a warn log instead of silently.
  @transient private lazy val clears = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Times the memo cache has been wholesale-cleared in this JVM. */
  def cacheClears: Long = clears.get()

  /** Unicode code points of `w` as single-symbol strings — the initial symbol
    * sequence. Code-point (not UTF-16 unit) granularity matches Spark
    * `substr` and DuckDB `substr`, the two engines the oracle compares. */
  private def codePoints(w: String): Array[String] = {
    val out = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      out.add(w.substring(i, i + cc))
      i += cc
    }
    out.toArray(new Array[String](out.size))
  }

  /** Token symbols of one pre-token under the merge table. */
  def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = codePoints(w)
    if (syms.length >= 2) {
      // presence superset: symbols ever seen in this word — lets us skip the
      // fuse scan for the overwhelming majority of merges (never wrongly:
      // a symbol absent from the superset is certainly absent from the word)
      val present = new java.util.HashSet[String](syms.length * 2)
      var i = 0
      while (i < syms.length) { present.add(syms(i)); i += 1 }
      var m = 0
      while (m < merges.length && syms.length >= 2) {
        val l = merges(m)(0); val r = merges(m)(1)
        if (present.contains(l) && present.contains(r)) {
          val out = new java.util.ArrayList[String](syms.length)
          var j = 0
          var fused = false
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out.add(merges(m)(2)); j += 2; fused = true
            } else { out.add(syms(j)); j += 1 }
          }
          if (fused) {
            present.add(merges(m)(2))
            syms = out.toArray(new Array[String](out.size))
          }
        }
        m += 1
      }
    }
    if (cache.size > CacheCap) {
      val n = clears.incrementAndGet()
      BpeCodec.logger.warn(
        s"BpeCodec memo cache wholesale clear #$n (cap=$CacheCap distinct " +
          "pre-tokens in this JVM) — memo hit rate will collapse on this corpus")
      cache.clear()
    }
    cache.put(w, syms)
    syms
  }

  /** Vocabulary id of a symbol. Default policy is LOUD on miss (the
    * geometry-mismatch discipline: an encode corpus whose alphabet exceeds
    * the vocab's would otherwise emit plausible-looking wrong ids); pipelines
    * that prefer graceful degradation on open text set an explicit `oovId`
    * sentinel instead — an OPT-IN, never a silent default. */
  def idFor(sym: String): Int = {
    val i = idOf.get(sym)
    if (i != null) i.intValue
    else if (oovId != BpeCodec.Loud) oovId
    else throw new IllegalArgumentException(
      s"bpe_apply: symbol '$sym' not in the ${vocabSyms.length}-entry vocabulary " +
        "(encode corpus and vocab must share an alphabet; pass an oovId to " +
        "degrade gracefully instead)")
  }

  /** ArrayData-facing entry shared by eval and generated code: encode every
    * pre-token and concatenate. Returns null if any pre-token is null (the
    * [[VecDot]] null rationale). `emitIds` selects array<int> ids vs
    * array<string> symbols. */
  def applyTokens(arr: ArrayData, emitIds: Boolean): ArrayData = {
    val n = arr.numElements()
    val words = new java.util.ArrayList[Array[String]](n)
    var total = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val syms = encodeWord(arr.getUTF8String(i).toString)
      words.add(syms)
      total += syms.length
      i += 1
    }
    if (emitIds) {
      val ids = new Array[Int](total)
      var k = 0; var wi = 0
      while (wi < words.size) {
        val syms = words.get(wi)
        var si = 0
        while (si < syms.length) { ids(k) = idFor(syms(si)); k += 1; si += 1 }
        wi += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(ids)
    } else {
      val out = new Array[AnyRef](total)
      var k = 0; var wi = 0
      while (wi < words.size) {
        val syms = words.get(wi)
        var si = 0
        while (si < syms.length) { out(k) = UTF8String.fromString(syms(si)); k += 1; si += 1 }
        wi += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** BPE encode as ONE native expression over the pre-token array
  * ([[graft.functions.TextFunctions.bpeTokens]]'s output): scan-side, no
  * shuffle, no explode — at 100 TB every document tokenizes in place during
  * the scan, which is what the hottest operator in a training-data pipeline
  * must do. The model travels as a [[BpeCodec]] reference object; generated
  * code is a single helper call (the reference-object-table pattern — the
  * merge loop itself gains nothing from inlining into Janino and would risk
  * the 64 KB method limit that bit the composed SQ8 decode).
  *
  * Output: array<string> token symbols, or array<int> vocabulary ids when
  * `emitIds` (containsNull=false). Null array or any null pre-token → null.
  * Unknown symbol under `emitIds` RAISES (see [[BpeCodec.idFor]]).
  */
case class BpeApply(child: Expression, codec: BpeCodec, emitIds: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(if (emitIds) IntegerType else StringType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply expects array<string> pre-tokens, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    codec.applyTokens(input.asInstanceOf[ArrayData], emitIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $ref.applyTokens($v, $emitIds);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override def prettyName: String = "bpe_apply"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCodec {
  /** Sentinel `oovId` meaning "raise on unknown symbols" (the default). */
  val Loud: Int = Int.MinValue

  private[expressions] val logger =
    org.slf4j.LoggerFactory.getLogger(classOf[BpeCodec])
}

object BpeApply {
  /** Token symbols of the pre-token array under the merge table. */
  def symbols(preTokens: Column, merges: Array[Array[String]]): Column =
    ColumnBridge.column(new BpeApply(ColumnBridge.expression(preTokens),
      new BpeCodec(merges, Array.empty, Array.empty), emitIds = false))

  /** Vocabulary ids of the pre-token array under the merge table + vocab.
    * `oovId = Some(x)` maps unknown symbols to `x`; None (default) raises. */
  def ids(preTokens: Column, merges: Array[Array[String]],
          vocabSyms: Array[String], vocabIds: Array[Int],
          oovId: Option[Int] = None): Column =
    ColumnBridge.column(new BpeApply(ColumnBridge.expression(preTokens),
      new BpeCodec(merges, vocabSyms, vocabIds,
        oovId.getOrElse(BpeCodec.Loud)), emitIds = true))
}
