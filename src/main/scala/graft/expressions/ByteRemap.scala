package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2 byte-level remap (Radford et al. 2019's `bytes_to_unicode`, the
  * public byte-level-BPE convention also used by RoBERTa/GPT-NeoX): a string
  * becomes its UTF-8 byte sequence with every byte replaced by one PRINTABLE
  * Unicode code point — visible-ASCII and upper-Latin-1 bytes map to
  * themselves, the 68 remaining byte values (controls, space, DEL, 0x80–0xA0,
  * 0xAD) map to U+0100.. in ascending byte order. The result: a 256-symbol
  * base alphabet in which NO text can ever be out-of-vocabulary — the reason
  * production tokenizers are byte-level. The map is a bijection, so
  * [[ByteRemap.unremapString]] exactly inverts it (losslessness is spec-pinned
  * on adversarial UTF-8: emoji, CJK, combining marks).
  *
  * Every mapped code point is < U+0400, i.e. one UTF-16 unit AND one code
  * point — so downstream symbol machinery (Spark `substr`, DuckDB `substr`,
  * [[BpeCodec]]'s code-point splitter) sees exactly one symbol per input
  * byte, and binary UTF-8 symbol order equals code-point order on both
  * engines (the tie-break contract of the merge argmax).
  *
  * One native expression (string→string): a per-character table walk is a
  * 256-entry array lookup, but as a composed Column it would need a 256-way
  * CASE per character — the codegen-budget trap. Generated code is a single
  * static helper call (the [[BpeApply]] pattern).
  */
case class ByteRemapExpr(child: Expression, inverse: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_remap expects string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      if (inverse) ByteRemap.unremapString(s) else ByteRemap.remapString(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ByteRemap.getClass.getName.stripSuffix("$") + ".MODULE$"
    val fn = if (inverse) "unremapString" else "remapString"
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $helper.$fn($v.toString()));
       """.stripMargin
    })
  }

  override def prettyName: String = if (inverse) "byte_unremap" else "byte_remap"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteRemap {

  /** Byte value → mapped code point (a char: every target is < U+0400).
    * Printable bytes (0x21–0x7E, 0xA1–0xAC, 0xAE–0xFF) map to themselves;
    * the 68 excluded bytes map to 0x100 + rank (ascending byte order) —
    * exactly the GPT-2 `bytes_to_unicode` table. */
  val byteToChar: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (0x100 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Mapped code point → byte value (the inverse bijection). */
  private val charToByte: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) { m.put(byteToChar(b), b.toByte); b += 1 }
    m
  }

  /** UTF-8 bytes of `s`, each remapped to its byte-level symbol char. */
  def remapString(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** Exact inverse of [[remapString]]. Loud on a char outside the 256-entry
    * table (such a string was not produced by the remap). */
  def unremapString(s: String): String = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val b = charToByte.get(s.charAt(i))
      if (b == null) throw new IllegalArgumentException(
        s"byte_unremap: char U+${s.charAt(i).toInt.toHexString} is not a " +
          "byte-level symbol — input was not produced by byte_remap")
      bytes(i) = b.byteValue
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Column form: byte-level symbols string of `s`. */
  def remap(s: Column): Column =
    ColumnBridge.column(ByteRemapExpr(ColumnBridge.expression(s), inverse = false))

  /** Column form: original text back from a byte-level symbols string. */
  def unremap(s: Column): Column =
    ColumnBridge.column(ByteRemapExpr(ColumnBridge.expression(s), inverse = true))
}
