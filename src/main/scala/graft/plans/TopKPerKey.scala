package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k rows per key under an explicit ordering — the whole-operator
  * custom-plan surface (SURVEY.md §5 option (c)): a logical node, a
  * planner [[Strategy]], and a physical operator, demonstrating the
  * full `LogicalPlan → SparkStrategy → SparkPlan` extension stack next
  * to the expression-level kernels.
  *
  * Why not `row_number() OVER (PARTITION BY key ORDER BY …) <= k`?
  * The window form SORTS every input row of every key and shuffles ALL
  * rows. This operator keeps a bounded k-row heap per key:
  *
  *   partial TopKPerKeyExec        ← per input partition, map-side
  *   → Exchange hash(keys)         ← shuffles ≤ k rows per (key, partition)
  *   → final TopKPerKeyExec        ← merges the per-partition top-ks
  *
  * — the same partial/final contract as an aggregate (the map-side
  * combine the reference's MR engine hand-rolls), with O(keys·k) state
  * and no sort anywhere. At 100 TB with millions of rows per hot key,
  * the shuffle carries k rows per map task instead of all of them.
  *
  * STATE BOUND (the honest caveat): the per-partition heap map is
  * O(distinct keys in that partition × k) rows with NO spill path —
  * right for ranking tables whose key side is bounded (query sets,
  * target items, per-group candidates: exactly this library's uses),
  * wrong for unbounded key cardinality where (keys/partition)·k rows
  * exceed executor memory; use the spilling window form there, or
  * pre-partition by key so each task sees few keys.
  *
  * Results are deterministic iff `order` is a TOTAL order (callers
  * append a unique tiebreak column, as with every ranking operator in
  * this library).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange via required
  * distribution) → final.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // total order over rows; heap keeps the k FIRST rows under it by
      // evicting the current worst (heap head = largest = worst)
      val rowOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](
            limit + 1, rowOrd.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator.asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. Self-registers the strategy on the
  * DataFrame's session (idempotent) so the operator works on any
  * session, extensions-built or not.
  */
object TopKOps {
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    // reject at the API boundary: ClusteredDistribution(Nil) would fail
    // deep inside planning with an unrelated-looking error. Global
    // top-k (no keys) is orderBy(...).limit(k) — already optimal as
    // TakeOrderedAndProject.
    require(keyCols.nonEmpty,
      "topKPerKey needs at least one key column; for global top-k use orderBy(...).limit(k)")
    val spark = df.sparkSession
    ensureStrategy(spark)
    import org.apache.spark.sql.graft.ColumnBridge
    // Let the ANALYZER convert/resolve the sort Columns (Spark 4
    // Columns are lazy ColumnNode wrappers, not catalyst expressions):
    // analyze a throwaway sortWithinPartitions and harvest its orders.
    val sortNode = ColumnBridge.analyzedPlan(df.sortWithinPartitions(orderBy: _*))
      .collectFirst { case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s }
      .getOrElse(throw new IllegalStateException("analyzer produced no Sort node"))
    val child = sortNode.child
    // resolve keys with the session's resolver (case-insensitive by
    // default, like every other Spark API) and refuse ambiguity instead
    // of silently binding the first duplicate name
    val resolver = spark.sessionState.conf.resolver
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      child.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"no column $n in ${child.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: matches ${many.mkString(", ")}")
      }
    }
    ColumnBridge.ofRows(spark, TopKPerKey(keyExprs, sortNode.order, k, child))
  }

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
}
