package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.WelfordAgg
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver-generated testdata (`/root/testdata/sf*`), paired — where the
  * semantics are ANSI-SQL-expressible — with a DuckDB oracle in
  * [[oracleSql]]. Column names and rounding are aligned on both sides
  * because the driver hash-compares values after sorting columns by name.
  */
object SparkEntry {


  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The a3_p1 hypothesis-testing pipeline end-to-end: tokenize → dense
    * top-k rel-freqs → per-word two-predictor standardized OLS.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_reg_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — composed
    * from the per-family registry slices (Entry*.scala; split r8,
    * purely mechanical).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =

    EntryCore.queries ++
    EntryDedup.queries ++
    EntrySimilarity.queries ++
    EntryCuration.queries ++
    EntryRelational.queries ++
    EntryTextModels.queries ++
    EntryFormats.queries ++
    EntryEval.queries

  def oracleSql: Map[String, String] =

    EntryCore.oracleSql ++
    EntryDedup.oracleSql ++
    EntrySimilarity.oracleSql ++
    EntryCuration.oracleSql ++
    EntryRelational.oracleSql ++
    EntryTextModels.oracleSql ++
    EntryFormats.oracleSql ++
    EntryEval.oracleSql
}
