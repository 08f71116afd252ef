package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-backed approximate aggregation with ERROR CERTIFICATES.
  *
  * At 100 TB, exact `count(DISTINCT …)` and exact `percentile()` are
  * the two aggregates that stop scaling first: exact distinct plans an
  * Expand + a second exchange keyed on (key, value) whose width is the
  * distinct cardinality itself, and exact percentile holds every value
  * of a group in one task's memory. The production path is the sketch
  * tier — HyperLogLog++ (`approx_count_distinct`) and the
  * Greenwald-Khanna quantile summary (`percentile_approx`) — both
  * mergeable, constant-size per group, one partial-aggregated exchange.
  *
  * These operators run the sketch NEXT TO the exact aggregate and
  * publish a boolean certificate that the sketch landed inside its
  * published error bound — the same equality-as-accuracy gate shape the
  * ANN family uses (a driver oracle that emits literal TRUE turns the
  * hash compare into a proof of the bound). The exact side exists only
  * to certify; a production pipeline keeps the sketch column and drops
  * the exact one, and the plan shape it relies on is already audited.
  */
object SketchOps {

  /** Per-key exact distinct count next to the HLL++ estimate, with a
    * certificate `within_bound` = relative error ≤ `errBound`.
    *
    * HLL++ `rsd` is a standard DEVIATION, not a hard bound — certify
    * against a multiple of it (3·rsd covers the estimator's tail in
    * practice; the sketch and its hash are deterministic, so a green
    * certificate on fixed data is stable, round over round). One
    * aggregate: the exact distinct plans Expand + two exchanges (its
    * documented cost — the thing the sketch tier removes); the HLL
    * rides the same exchange as a mergeable buffer.
    */
  def distinctCountCertificate(df: DataFrame, keys: Seq[String],
      valueCol: String, rsd: Double, errBound: Double): DataFrame = {
    val apx = approx_count_distinct(col(valueCol), rsd)
    df.groupBy(keys.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("exact_n"),
        apx.as("approx_n"))
      .select(keys.map(col) :+ col("exact_n") :+
        (abs(col("approx_n") - col("exact_n")).cast("double") /
          col("exact_n") <= lit(errBound)).as("within_bound"): _*)
  }

  /** Per-(key, quantile) certificate that `percentile_approx`'s result
    * respects its rank-error guarantee: the returned value is an actual
    * element of the group whose rank interval [#{v < x}+1, #{v ≤ x}]
    * must intersect [target − ε, target + ε], where target = ⌈q·n⌉
    * (the Greenwald-Khanna query convention Spark's QuantileSummaries
    * uses) and ε = n/accuracy + 1 — the sketch's published rank error
    * plus one fencepost for the ceil discretization at tiny ε·n.
    *
    * Two passes over the group's rows, both cheap at scale:
    *  1. one mergeable aggregate per key → n + the quantile array
    *     (constant size per group, partial-combined);
    *  2. the (key-cardinality × |qs|) quantile table broadcasts back
    *     onto the data for the rank counts — a broadcast join + one
    *     more partial-aggregated exchange on (key, q_idx).
    * No group ever sits in one task's memory — that's the exact
    * percentile's failure mode this tier exists to avoid.
    */
  def quantileCertificate(df: DataFrame, keys: Seq[String],
      valueCol: String, qs: Seq[Double], accuracy: Int): DataFrame = {
    val kCols = keys.map(col)
    val qArr = array(qs.map(lit): _*)
    val summary = df.groupBy(kCols: _*)
      .agg(count(lit(1)).as("n"),
        percentile_approx(col(valueCol), qArr, lit(accuracy)).as("qv"))
      .select(kCols :+ col("n") :+
        posexplode(col("qv")).as(Seq("q_idx", "qval")): _*)
    val ranks = df.select(kCols :+ col(valueCol).as("__v"): _*)
      .join(broadcast(summary), keys)
      .groupBy(kCols :+ col("q_idx"): _*)
      .agg(first(col("n")).as("n"),
        sum(when(col("__v") <= col("qval"), 1L).otherwise(0L)).as("rank_le"),
        sum(when(col("__v") < col("qval"), 1L).otherwise(0L)).as("rank_lt"))
    val target = ceil(element_at(qArr, col("q_idx") + 1) * col("n"))
    val eps = col("n").cast("double") / accuracy + lit(1.0)
    ranks.select(kCols :+ col("q_idx") :+ col("n") :+
      (col("rank_le") >= target - eps &&
        (col("rank_lt") + lit(1L)) <= target + eps).as("within_bound"): _*)
  }
}
