package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the expectation-suite layer every
  * production pipeline runs before publishing a table (Great-
  * Expectations / Deequ-shaped, rebuilt as plain Catalyst plans). Each
  * rule reduces to ONE aggregate (or one anti-join + aggregate) and
  * the report is their union: a (rule, n_checked, n_violations) row
  * per expectation, cheap enough to run on every batch at any scale —
  * no rule materializes violating ROWS (that's a debugging query, not
  * a gate; counts keep the report constant-sized).
  */
object DataQualityOps {

  /** Key-uniqueness expectation: violations = rows beyond the first
    * per key (count − distinct count), one aggregate pass.
    */
  def uniqueKey(df: DataFrame, rule: String, key: String): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - count_distinct(col(key))).as("n_violations"))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))

  /** Referential-integrity expectation: violations = child rows whose
    * foreign key has no parent (left anti join, broadcast when the
    * parent key set is small).
    */
  def refIntegrity(child: DataFrame, rule: String, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(orphans)
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))
  }

  /** Predicate expectation: violations = rows where `expect` is NOT
    * satisfied (null counts as a violation — an expectation must hold,
    * not merely fail to be false).
    */
  def expectAll(df: DataFrame, rule: String, expect: Column): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        count(when(not(coalesce(expect, lit(false))), lit(1)))
          .as("n_violations"))
      .select(lit(rule).as("rule"), col("n_checked"), col("n_violations"))

  /** Union a rule set into one report frame. */
  def report(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_.unionByName(_))

  /** ε-differentially-private group-count release: per-group counts
    * with Laplace(1/ε) noise via inverse-CDF on a seeded md5 uniform —
    * the aggregate-publication primitive for sharing corpus statistics
    * (per-source doc counts, per-language token totals) without
    * revealing any single row's presence. Count sensitivity is 1, so
    * scale b = 1/ε gives ε-DP (Dwork et al. 2006).
    *
    * Deterministic and engine-portable BY DESIGN: the noise draw
    * hashes (group ‖ seed), the draw is strictly inside (0,1)
    * ([[RelationalOps.hashUniformOpen]] — ln(0) can't happen), and the
    * ln term is rounded to 9 dp (absorbing libm's 1-ulp spread, the
    * A-ES/LM-NLL precedent) so both engines feed IDENTICAL doubles to
    * the two remaining IEEE ops (scale multiply, count add). The
    * published `noisy_n` is the RAW double — bit-exact cross-engine —
    * never re-rounded (re-rounding a 9-dp tail can land on decimal
    * .5 boundaries where engines' round() disagree).
    *
    * CAVEAT (real DP deployments): a hash-seeded draw is pseudo-random
    * — release the seed and the noise is invertible. Production use
    * must treat `seed` as a secret or swap in a CSPRNG draw; the
    * deterministic form exists so the release pipeline is testable and
    * replayable. One aggregate + map-local noise; no extra exchange.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String, eps: Double,
      seed: String): DataFrame = {
    require(eps > 0, "epsilon must be positive")
    val u = RelationalOps.hashUniformOpen(col(groupCol), seed)
    val lnTerm = round(log(lit(1.0) - lit(2.0) * abs(u - lit(0.5))), 9)
    val noise = lit(-1.0 / eps) * signum(u - lit(0.5)) * lnTerm
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol), lit(eps).as("epsilon"),
        (col("__n").cast("double") + noise).as("noisy_n"))
  }
}
