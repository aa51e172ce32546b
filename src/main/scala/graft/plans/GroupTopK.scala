package graft.plans

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Grouped top-k as a WHOLE-OPERATOR custom plan — logical node → planner
  * strategy → two physical stages — the missing rung between
  * `TakeOrderedAndProject` (global top-k, no groups) and window `row_number`
  * (grouped, but SORTS every row of every group).
  *
  * Why an operator and not a window: at 100 TB, "best k docs per source" via
  * `row_number().over(partitionBy(g).orderBy(o))` shuffles the WHOLE corpus
  * and sorts each group just to discard all but k rows. This operator keeps a
  * bounded heap per group on each input partition (partial stage), so at most
  * k rows per (partition, group) reach the exchange, and the final stage —
  * fed by a Catalyst-inserted hash exchange on the group keys, requested
  * through `requiredChildDistribution` exactly like partial/final aggregation
  * — re-selects the true top-k per group. Shuffle bytes drop from corpus-size
  * to partitions × groups × k; no sort appears anywhere in the plan
  * (plan-asserted in GroupTopKSpec, equivalence with the window formulation
  * oracle-checked by q112 and property-tested).
  *
  * State per task is groups-on-that-partition × k rows. Unlike hash
  * aggregation the heaps DO NOT SPILL — the state is registered with the
  * TaskMemoryManager (a non-spillable [[MemoryConsumer]], so memory pressure
  * is visible to Spark and other consumers spill first) and the task fails
  * with an explicit message, not an opaque executor OOM, if group cardinality
  * × k outgrows its share of execution memory. For genuinely unbounded group
  * cardinality with large k, the window `row_number` formulation (which sorts
  * and therefore spills) is the fallback. Ties: make the sort orders total
  * (include the id) or the kept set at the boundary is undefined, as with any
  * top-k.
  */
case class GroupTopKPlan(groupCols: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKPlan =
    copy(child = newChild)
}

/** Shared bounded-selection routine: one pass, a ≤k-row heap per group key.
  *
  * Heap state is accounted against the task's execution-memory pool through a
  * non-spillable [[MemoryConsumer]]: every retained row/key acquires its size,
  * Spark asks OTHER (spillable) consumers to spill under pressure, and if the
  * pool still can't cover the heaps the task fails with an explicit
  * group-cardinality message instead of an untracked executor OOM. Evicted
  * rows return their bytes to the local budget (reservation is high-water,
  * released at task end). */
private[plans] object BoundedGroupHeaps {
  /** Cannot free anything on demand (bounded heaps have no spill format) —
    * registering still makes the memory visible to the manager. */
  private final class HeapConsumer(tmm: TaskMemoryManager)
    extends MemoryConsumer(tmm, tmm.pageSizeBytes(), MemoryMode.ON_HEAP) {
    override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
  }

  private def rowBytes(row: InternalRow, fields: Int): Long = row match {
    case u: UnsafeRow => u.getSizeInBytes.toLong + 16L
    case _ => 32L + 16L * fields // conservative JVM-object estimate
  }

  def select(iter: Iterator[InternalRow], groupCols: Seq[Expression],
             order: Seq[SortOrder], k: Int,
             output: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupCols, output)
    val ord = RowOrdering.create(order, output) // compare < 0 → ranks earlier
    val ctx = TaskContext.get()
    val consumer = if (ctx == null) null
      else new HeapConsumer(org.apache.spark.graftbridge.MemoryBridge.taskMemoryManager(ctx))
    var reserved = 0L // acquired from the pool (high-water, freed at task end)
    var used = 0L     // currently held by live heap entries
    if (consumer != null)
      ctx.addTaskCompletionListener[Unit](_ => consumer.freeMemory(reserved))
    def retain(bytes: Long): Unit = { // acquire in ≥1 MiB strides
      used += bytes
      if (consumer != null && used > reserved) {
        reserved += consumer.acquireMemory(math.max(used - reserved, 1L << 20))
        if (reserved < used) throw new org.apache.spark.SparkException(
          s"GroupTopK: per-task top-$k heaps exceeded execution memory " +
            s"($used bytes needed). Group cardinality on this partition is too " +
            "high for the bounded-heap operator — use the window row_number " +
            "formulation (which spills) or raise executor memory.")
      }
    }
    // PriorityQueue dequeues the MAX of its Ordering; with `ord` directly the
    // max is the row ranking LAST among the kept — the eviction candidate.
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    val nFields = output.size
    iter.foreach { row =>
      val key = keyProj(row) // reused buffer — copy ONLY on first insertion
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](
            ord.asInstanceOf[Ordering[InternalRow]])
          val kc = key.copy()
          retain(rowBytes(kc, groupCols.size) + 64L) // key + map-entry overhead
          heaps.put(kc, h)
          h
      }
      if (heap.size < k) {
        val rc = row.copy(); retain(rowBytes(rc, nFields)); heap.enqueue(rc)
      } else if (ord.compare(row, heap.head) < 0) {
        used -= rowBytes(heap.dequeue(), nFields)
        val rc = row.copy(); retain(rowBytes(rc, nFields)); heap.enqueue(rc)
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Partial stage: bounded selection per input partition, no distribution
  * requirement — runs where the data already is. */
case class GroupTopKPartialExec(groupCols: Seq[Expression], order: Seq[SortOrder],
                                k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // row-preserving per partition — keep the child's partitioning visible so
  // downstream operators clustered on the same keys don't re-shuffle
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupCols, order, k, child.output) // don't capture `this`
    child.execute().mapPartitions(BoundedGroupHeaps.select(_, g, o, kk, out))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKPartialExec =
    copy(child = newChild)
}

/** Final stage: demands co-location by group key (EnsureRequirements inserts
  * the hash exchange), then re-runs the same bounded selection — now over at
  * most partitions × k candidates per group. */
case class GroupTopKFinalExec(groupCols: Seq[Expression], order: Seq[SortOrder],
                              k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    // empty groups = GLOBAL top-k: all partial candidates must meet in one
    // place or the final stage would emit top-k per partition
    if (groupCols.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupCols))
  // row-preserving on the exchanged child: expose the hash partitioning the
  // exchange established, so e.g. a rank window over the same group keys
  // (the ≤ groups×k survivors) plans WITHOUT a second exchange
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupCols, order, k, child.output) // don't capture `this`
    child.execute().mapPartitions(BoundedGroupHeaps.select(_, g, o, kk, out))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKFinalExec =
    copy(child = newChild)
}

/** Planner strategy: logical GroupTopKPlan → final(partial(child)). */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKPlan(g, o, k, child) =>
      GroupTopKFinalExec(g, o, k,
        GroupTopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** Guards the check-then-append on `experimental.extraStrategies` —
    * concurrent first calls must not register the strategy twice (a duplicate
    * is harmless to correctness but plans every query's strategy pass twice). */
  private val registrationLock = new Object

  /** Top-k rows per group, ordered by `orderBy` specs of (column, ascending) —
    * include a unique tie-break column for a deterministic boundary. Column
    * names resolve against `df`'s analyzed output directly (the node carries
    * only RESOLVED, serializable catalyst expressions — no analyzer round
    * trip); resolution is case-insensitive like Spark's default, and FAILS on
    * a case-colliding ambiguity instead of picking one silently. Output
    * columns = input columns; row order within the result is unspecified. */
  def topK(df: DataFrame, groupCols: Seq[String],
           orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupTopKStrategy
    }
    val output = ColumnBridge.logicalPlan(df).output
    def attr(name: String): Attribute =
      output.filter(_.name.equalsIgnoreCase(name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${output.map(_.name).mkString(", ")}")
        case many => many.filter(_.name == name) match {
          case Seq(exact) => exact // exact case disambiguates
          case _ => throw new IllegalArgumentException(
            s"column $name is ambiguous under case-insensitive resolution: " +
              many.map(_.name).mkString(", "))
        }
      }
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      GroupTopKPlan(groupCols.map(attr), sortOrders, k,
        ColumnBridge.logicalPlan(df)))
  }
}
