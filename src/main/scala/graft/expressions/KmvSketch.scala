package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — Bar-Yossef et al. 2002's bottom-k estimator,
  * the mergeable-summaries workhorse for approximate COUNT(DISTINCT).
  *
  * State is AT MOST k distinct hash values regardless of input cardinality.
  * The scale rationale mirrors [[MisraGries]]: exact distinct counting over a
  * 100 TB column shuffles every distinct value; this sketch shuffles one
  * <= k-entry sorted set per partition, with map-side partial aggregation.
  * Merge = set-union keep-k-smallest, fully order-insensitive: the final state
  * is exactly "the k smallest distinct hash values of the whole input", no
  * matter how partitions are scheduled — which is why (unusually for a sketch)
  * its output is DETERMINISTIC and can be hash-compared against a relational
  * oracle replay (window rank over distinct hashes).
  *
  * The estimator downstream: with h(k) the k-th smallest of n >= k distinct
  * uniform hashes in [0, 2^32), E[h(k)/2^32] = k/(n+1), so
  * n_hat = (k-1) * 2^32 / h(k) (the unbiased form). Below k distinct values the
  * sketch IS the exact distinct set — the estimate is its size. Both arms are
  * exact integer-ratio arithmetic, IEEE-identical across engines.
  *
  * Input contract: child must already be a UNIFORM hash (e.g. the first 32
  * md5 bits of the value — [[graft.functions.TextFunctions.hashBucket]]'s
  * construction); hashing inside the aggregate would re-hash per update on
  * pre-hashed inputs and hide the hash choice from the oracle.
  */
case class KmvSketch(child: Expression, k: Int,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"sketch size k must be >= 2: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf.add(h)
    else if (h < buf.last && !buf.contains(h)) { buf.add(h); buf.remove(buf.last) }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  /** Sorted ascending array of the <= k smallest distinct hashes. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {
  /** Column API: aggregates a pre-hashed long column to the sorted array of its
    * k smallest distinct values. */
  def kmvMinima(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())
}
