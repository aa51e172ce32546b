package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bit math + wire format shared by the aggregate (build) and scalar (probe)
  * sides. Format, big-endian: [int numHashes][int numWords][numWords × long].
  * Probe indexes come from double hashing (Kirsch–Mitzenmacher 2006):
  * idx_i = (h + i·g(h)) mod numBits with g an odd splitmix64 finalizer of h —
  * k independent-enough probes from ONE 64-bit input hash. Methods here are
  * called from generated code (static forwarders), so probing stays inside
  * whole-stage codegen. */
object BloomFilterImpl {

  /** splitmix64 finalizer, forced odd so step sizes cycle the whole table. */
  def secondHash(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  def setBits(words: Array[Long], numHashes: Int, h: Long): Unit = {
    val numBits = words.length.toLong * 64L
    val h2 = secondHash(h)
    var i = 0
    while (i < numHashes) {
      val idx = ((h + i * h2) & Long.MaxValue) % numBits
      words((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  def toBytes(numHashes: Int, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val numHashes = bb.getInt()
    val words = Array.fill(bb.getInt())(bb.getLong())
    (numHashes, words)
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readWord(b: Array[Byte], wi: Int): Long = {
    val off = 8 + wi * 8
    var w = 0L
    var j = 0
    while (j < 8) { w = (w << 8) | (b(off + j) & 0xffL); j += 1 }
    w
  }

  /** Probe directly against the wire bytes — no deserialization per row. */
  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    val numHashes = readInt(bytes, 0)
    val numBits = readInt(bytes, 4).toLong * 64L
    if (numBits == 0) return false
    val h2 = secondHash(h)
    var i = 0
    while (i < numHashes) {
      val idx = ((h + i * h2) & Long.MaxValue) % numBits
      if ((readWord(bytes, (idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build as a native `TypedImperativeAggregate`: state is the
  * fixed-size bit array, update sets k bits per pre-hashed input, merge is a
  * word-wise OR — fully order-insensitive, map-side combined. The 100 TB use
  * is JOIN PRUNING: build over the small side's join key, probe the big side
  * scan-side (see [[graft.operators.BloomJoin]]), so the shuffle only carries
  * probable matches — the hand-rolled analog of Spark's own runtime-filter
  * injection, available where the optimizer can't see the opportunity.
  *
  * Input contract (as [[KmvSketch]]): `child` must already be a uniform
  * 64-bit hash of the key (e.g. `xxhash64`), keeping the hash choice visible
  * in the plan. */
case class BloomFilterAgg(child: Expression, numBits: Int, numHashes: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64, s"numBits must be >= 64: $numBits")
  require(numHashes >= 1 && numHashes <= 16, s"numHashes must be in [1,16]: $numHashes")

  private val numWords = (numBits + 63) / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilterImpl.setBits(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomFilterImpl.toBytes(numHashes, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomFilterImpl.toBytes(numHashes, buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFilterImpl.fromBytes(bytes)._2

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_build"
}

/** Scalar probe: `bloom_might_contain(filterBytes, hash)` — true if the hash
  * MAY be in the set (no false negatives; false positives at the configured
  * rate). Codegen emits a static call into [[BloomFilterImpl]], so probing a
  * scan stays inside whole-stage codegen. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, bigint), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(bloom: Any, h: Any): Any =
    BloomFilterImpl.mightContain(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.expressions.BloomFilterImpl.mightContain($b, $h);")

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API front door. */
object BloomFilters {
  /** Aggregate a pre-hashed long column into bloom-filter bytes. */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomFilterAgg(ColumnBridge.expression(hash), numBits, numHashes)
        .toAggregateExpression())

  /** Probe bloom bytes (usually a collected literal) with a hash column. */
  def mightContain(bloom: Column, hash: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash)))
}
