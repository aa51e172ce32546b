package org.apache.spark.graftbridge

import org.apache.spark.TaskContext
import org.apache.spark.memory.TaskMemoryManager

/** `TaskContext.taskMemoryManager()` is `private[spark]`; custom physical
  * operators that hold per-task state (graft.plans.GroupTopK's bounded heaps)
  * need it to register their memory with the task's execution pool. Same
  * narrow-bridge pattern as [[org.apache.spark.sql.graftbridge.ColumnBridge]].
  */
object MemoryBridge {
  def taskMemoryManager(ctx: TaskContext): TaskMemoryManager = ctx.taskMemoryManager()
}
