package org.apache.spark.graft

import org.apache.spark.{SparkConf, TaskContext}
import org.apache.spark.memory.{TaskMemoryManager, UnifiedMemoryManager}

/** Bridge into `private[spark]` memory plumbing (same pattern as
  * [[org.apache.spark.sql.graft.ColumnBridge]] for the sql side):
  * custom physical operators that budget their state like Spark's own
  * (TaskMemoryManager acquisition) need the task's manager, which is
  * not public API.
  */
object MemoryBridge {

  /** The running task's memory manager (executor side). */
  def taskMemoryManager(tc: TaskContext): TaskMemoryManager =
    tc.taskMemoryManager()

  /** Test-only: a standalone TaskMemoryManager over a deliberately tiny
    * unified pool, so specs can prove acquisition DENIAL (the condition
    * a shared multi-gigabyte test session can never produce) without
    * building a second SparkContext.
    */
  def standaloneTaskMemoryManager(systemMemoryBytes: Long): TaskMemoryManager = {
    val conf = new SparkConf(false)
      .set("spark.testing", "true")
      .set("spark.testing.memory", systemMemoryBytes.toString)
      .set("spark.memory.offHeap.enabled", "false")
    new TaskMemoryManager(UnifiedMemoryManager(conf, numCores = 1), 0L)
  }
}
