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
}
