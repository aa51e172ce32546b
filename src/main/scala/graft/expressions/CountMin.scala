package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * `TypedImperativeAggregate` — point-frequency estimation with FIXED state
  * (depth × width longs) regardless of key cardinality, completing the
  * mergeable-summaries family next to [[MisraGries]] (heavy hitters),
  * [[KmvSketch]] (distinct counts) and [[BloomFilterAgg]] (membership).
  * Estimates are upper bounds: est(k) = min over rows of the k-cell, wrong
  * only upward by collision mass (≤ εN at depth ln(1/δ), width e/ε).
  *
  * Merge is cell-wise addition — fully order-insensitive, so (unusually for a
  * sketch) the filled cells are DETERMINISTIC and the whole sketch is
  * oracle-checkable by replaying the cell sums relationally.
  *
  * Input contract: the child is the PRE-COMPUTED index array — element d is
  * the row-d cell index of the key, e.g. `md5Bits32(concat(lit(d + ":"),
  * key)) % width` per row (see q110) — keeping the hash family visible in the
  * plan and replicable in oracle SQL, exactly as [[KmvSketch]] externalizes
  * its hash. */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
                          override val mutableAggBufferOffset: Int = 0,
                          override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
  require(width >= 2, s"width must be >= 2: $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idxs = v.asInstanceOf[ArrayData]
      require(idxs.numElements() == depth,
        s"index array has ${idxs.numElements()} elements, sketch depth is $depth")
      var d = 0
      while (d < depth) {
        val idx = idxs.getLong(d)
        require(idx >= 0 && idx < width, s"row-$d index $idx outside [0,$width)")
        buf(d * width + idx.toInt) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "count_min_sketch"
}

object CountMinSketch {
  /** Column API: aggregate pre-computed index arrays into the flat
    * depth×width cell array (row-major). */
  def cmsAgg(idxs: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinSketch(ColumnBridge.expression(idxs), depth, width)
        .toAggregateExpression())

  /** Point estimate from a collected cell array: min over rows of the key's
    * cell (driver-side — probes are a handful of keys). */
  def estimate(cells: Array[Long], width: Int, rowIdxs: Seq[Long]): Long =
    rowIdxs.zipWithIndex.map { case (idx, d) => cells(d * width + idx.toInt) }.min

  /** Driver-side twin of the scan-side index derivation
    * (`md5Bits32(concat(lit(d + ":"), key)) % width`): first 32 md5 bits of
    * "d:key" modulo width, per row d. ONE definition keeps probes, the q110
    * query, its oracle SQL and the spec bit-identical. */
  def probeIdxs(key: String, depth: Int, width: Int): Seq[Long] =
    (0 until depth).map { d =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:$key".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16) % width
    }
}
