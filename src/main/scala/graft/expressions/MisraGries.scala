package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native `TypedImperativeAggregate`.
  *
  * State is AT MOST `k` (item, weight) counters regardless of input cardinality —
  * the scale rationale: an exact `groupBy(item).count()` over a 100 TB token
  * stream shuffles every distinct item; this sketch shuffles one <= k-entry map
  * per partition (classic mergeable-summaries result: Agarwal et al., PODS'12).
  *
  * Guarantee: every item with true frequency > N/k survives in the final map
  * (weights are UNDER-estimates, off by at most N/k). Use it as a candidate
  * filter and recount the candidates exactly for deterministic output — see
  * [[graft.operators.HeavyHitters]].
  *
  * Merge combines counts and, if over k entries, subtracts the (k+1)-th largest
  * weight from every counter and drops the non-positives — the order-insensitive
  * bound-preserving merge, so partition scheduling cannot change the guarantee
  * (the surviving SET may vary with merge order; only the guaranteed superset
  * property matters, and the exact recount downstream absorbs the rest).
  */
case class MisraGries(child: Expression, k: Int,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"sketch size k must be positive: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None => // decrement-all step: every counter pays one
          val dead = buf.iterator.filter(_._2 <= 1L).map(_._1).toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) => b1.update(item, b1.getOrElse(item, 0L) + c) }
    if (b1.size > k) {
      // subtract the (k+1)-th largest weight; at most k strictly-greater survive
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = b1.iterator.filter(_._2 <= cut).map(_._1).toList
      b1.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1) // deterministic key order
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Column API: `misraGries(col, k)` aggregates to a map<string,bigint> of at
    * most k candidate heavy hitters with under-estimated weights. */
  def misraGries(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
