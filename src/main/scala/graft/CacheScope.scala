package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Scoped caching for operator-internal reuse: persist a frame that
  * feeds several branches of ONE downstream query, and release it
  * automatically when that query finishes.
  *
  * Operators in this library persist intermediates (the deduped
  * ratings, the shingle+signature base, the token stream) so a
  * multi-branch plan materializes the expensive subtree once. The
  * caller's action, however, runs AFTER the operator function returns
  * — a try/finally around the persist would unpersist before anything
  * evaluated. [[autoRelease]] closes the gap the Spark-idiomatic way: a
  * one-shot [[QueryExecutionListener]] watches for the first query
  * execution whose analyzed plan CONTAINS the persisted subtree
  * (success or failure) and unpersists + unregisters itself. A library
  * user embedding these operators in a long-lived session therefore
  * never accumulates orphaned MEMORY_AND_DISK blocks — cache lifetime
  * is owned by the operator, not the harness.
  *
  * Contract notes:
  *  - Dataset-API actions (collect/write/count/…) fire the listener.
  *    A raw `queryExecution.toRdd` action has no SQL execution id, so
  *    no SQLExecutionEnd event reaches the listener bus; [[fullEval]]
  *    closes that path by running the toRdd action under a named
  *    execution id — harnesses that need full-plan evaluation (Bench)
  *    use it (and keep clearCache() as belt-and-braces only).
  *  - Re-running the SAME returned frame after release just recomputes
  *    without the cache — correctness never depends on the persist.
  *  - If the result is never evaluated, the (lazy) persist never
  *    materializes storage; only the idle listener remains.
  *  - Release is asynchronous (listener bus), typically milliseconds
  *    after the action completes.
  */
object CacheScope {

  /** Run `body` once, when the FIRST query execution whose analyzed
    * plan contains `df`'s subtree completes (success or failure), then
    * unregister. The one-shot release trigger behind [[autoRelease]],
    * exposed for operators that must release SEVERAL resources with
    * one consumer (e.g. an iterative loop's intermediate levels —
    * GraphOps.bfsHops).
    */
  def onConsumed(df: DataFrame)(body: => Unit): Unit = {
    val spark = df.sparkSession
    val target = df.queryExecution.analyzed
    val fired = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeFire(qe: QueryExecution): Unit = {
        // a listener must never throw into the bus — treat any plan-
        // inspection failure as "not consumed"
        val consumed =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => false }
        if (consumed && fired.compareAndSet(false, true)) {
          try body
          finally spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeFire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeFire(qe)
    }
    spark.listenerManager.register(listener)
  }

  /** Persist `df` (MEMORY_AND_DISK) until the first consuming query
    * execution completes, then unpersist automatically.
    */
  def autoRelease(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val persisted = df.persist(level)
    onConsumed(persisted)(persisted.unpersist(blocking = false))
    persisted
  }

  /** FULL evaluation of a frame — every output column materialized into
    * the executed plan's UnsafeRow stream (`toRdd.count()`; a plain
    * `df.count()` lets Catalyst prune all computed columns) — run under
    * a named SQL execution id so the action is visible to
    * QueryExecutionListeners and [[autoRelease]]'s scoped caches
    * release exactly as they do for Dataset-API actions. Returns the
    * row count.
    */
  def fullEval(df: DataFrame): Long = {
    val qe = df.queryExecution
    org.apache.spark.sql.graft.ColumnBridge.withNamedExecution(qe, "graft.fullEval")(
      qe.toRdd.count())
  }
}
