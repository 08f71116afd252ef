package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: plan a naive interval-containment INNER join as the
  * bucketized equi-join of [[graft.operators.TemporalOps.rangeJoinPoints]]
  * automatically.
  *
  * Spark plans `points JOIN intervals ON ts >= lo AND ts <= hi` as
  * BroadcastNestedLoopJoin — O(|P|·|I|) pair evaluations, the classic
  * big-big range-join cliff. When this rule is enabled (set
  * `spark.graft.rangeJoin.bucketWidthUs` to a bucket width in
  * microseconds) and the join condition is exactly a band over one
  * left-side timestamp bounded by two right-side expressions, the join
  * is rewritten to:
  *
  *   Filter(origCond,
  *     Join(left + bucket(ts), explode(bucketRange(lo, hi)) on right,
  *          Inner, leftBucket = rightBucket))
  *
  * i.e. both sides gain a coarse time-bucket key, the join becomes a
  * plain hash-partitionable EQUI-join, and the ORIGINAL predicate is
  * kept as a post-join filter — so the rewrite is semantics-preserving
  * by construction for ANY comparison mix (strict or not): bucket
  * containment over-approximates the band, the filter re-applies it
  * exactly.
  *
  * Scope guards (all must hold, otherwise the plan is left untouched):
  * inner join, condition is `ts >= lo && ts <= hi` (or strict variants),
  * `ts` resolves only against the left child and `lo`/`hi` only against
  * the right, and all three are TIMESTAMP-typed. Registered via
  * [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`; default OFF (no conf = no
  * rewrite).
  */
object RewriteRangeJoin {
  /** Register the rule on a live session (idempotent) — the
    * `spark.experimental.extraOptimizations` path for sessions not
    * built with [[graft.GraftExtensions]]. The rule stays inert until
    * `spark.graft.rangeJoin.bucketWidthUs` is also set.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RewriteRangeJoin]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRangeJoin(spark)
}

case class RewriteRangeJoin(session: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.bucketWidthUs"

  /** Exact floor division on longs (negative-safe, unlike `div`'s
    * truncation): (x − pmod(x, w)) div w.
    */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  private def bucketOf(ts: Expression, w: Long): Expression =
    floorDiv(UnixMicros(ts), w)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = session.conf.get(ConfKey, "")
    if (widthStr.isEmpty) return plan
    // the rule runs on EVERY plan of the session — a malformed or
    // non-positive conf value must make the rule inert, never make
    // unrelated queries throw from inside the optimizer
    val width = scala.util.Try(widthStr.trim.toLong).toOption.filter(_ > 0) match {
      case Some(w) => w
      case None =>
        logWarning(s"$ConfKey='$widthStr' is not a positive long; range-join rewrite disabled")
        return plan
    }
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        matchBand(cond, l, r) match {
          case Some((ts, lo, hi)) =>
            // expressions built post-analysis must carry the session
            // timezone themselves — the analyzer's ResolveTimeZone has
            // already run, and a TimeZoneAwareExpression without one
            // reports the plan as unresolved
            val tz = Option(session.sessionState.conf.sessionLocalTimeZone)
            def tzFix(e: Expression): Expression = e.transformUp {
              case t: TimeZoneAwareExpression if t.timeZoneId.isEmpty =>
                t.withTimeZone(tz.get)
            }
            val lBucket = Alias(tzFix(bucketOf(ts, width)), "__graft_b")()
            val newLeft = Project(l.output :+ lBucket, l)
            val rBucketAttr = AttributeReference("__graft_b", LongType)()
            val gen = Explode(tzFix(new Sequence(
              bucketOf(lo, width), bucketOf(hi, width), Literal(1L))))
            // degenerate intervals (lo > hi — the step-1 Sequence would
            // THROW on an inverted range — or null bounds) can never
            // satisfy the band; filtering them is semantics-preserving
            val validIntervals = Filter(LessThanOrEqual(lo, hi), r)
            val newRight = Generate(gen, unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(rBucketAttr), child = validIntervals)
            val eq = EqualTo(lBucket.toAttribute, rBucketAttr)
            val joined = Join(newLeft, newRight, Inner, Some(eq), hint)
            // original band predicate re-applied exactly; helper bucket
            // columns dropped so the output schema is unchanged
            Project(j.output, Filter(cond, joined))
          case None => j
        }
    }
  }

  /** Returns (ts, lo, hi) when `cond` is a band `ts ≥/> lo AND ts ≤/< hi`
    * with ts from the left child and lo/hi from the right (any
    * conjunct order, any comparison orientation).
    */
  private def matchBand(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def isTs(e: Expression) =
      e.dataType == org.apache.spark.sql.types.TimestampType
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(r.outputSet)
    // normalize each conjunct to (ts, bound, isLower)
    def side(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, true))
      case GreaterThan(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, true))
      case LessThanOrEqual(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, false))
      case LessThan(a, b) if fromLeft(a) && fromRight(b) => Some((a, b, false))
      case GreaterThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, false))
      case GreaterThan(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, false))
      case LessThanOrEqual(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, true))
      case LessThan(a, b) if fromRight(a) && fromLeft(b) => Some((b, a, true))
      case _ => None
    }
    cond match {
      case And(c1, c2) =>
        (side(c1), side(c2)) match {
          case (Some((ts1, lo, true)), Some((ts2, hi, false)))
              if ts1.semanticEquals(ts2) && isTs(ts1) && isTs(lo) && isTs(hi) =>
            Some((ts1, lo, hi))
          case (Some((ts1, hi, false)), Some((ts2, lo, true)))
              if ts1.semanticEquals(ts2) && isTs(ts1) && isTs(lo) && isTs(hi) =>
            Some((ts1, lo, hi))
          case _ => None
        }
      case _ => None
    }
  }
}
