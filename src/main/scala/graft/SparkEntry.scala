package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk_words")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6 T1 + §2.4 A1/A2 + §2.8 F1/F2: tokenize → count → top-k.
    "q_topk_words" -> ((s, dir) => TextOps.topKWords(Tables.documents(s, dir), 100)),
    // §2.4 A3 + §2.8 F3: per-letter mean/std-dev over dense per-doc counts.
    "q_char_hist" -> ((s, dir) => TextOps.charHistogram(Tables.documents(s, dir)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_topk_words" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '((?:[\.,!?;"])|(?:(?:\#|\@)?[A-Za-z0-9_\-]+(?:''[a-z]{1,3})?))', 1)) AS word
        |  FROM documents
        |) t GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 100""".stripMargin,
    "q_char_hist" ->
      """WITH perdoc AS (
        |  SELECT doc_id, ch, count(*) AS n FROM (
        |    SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z]', '', 'g'), '')) AS ch
        |    FROM documents
        |  ) x WHERE ch <> '' GROUP BY doc_id, ch
        |), alphabet AS (
        |  SELECT chr((97 + i)::INTEGER) AS ch FROM range(26) t(i)
        |), dense AS (
        |  SELECT a.ch, coalesce(p.n, 0) AS n
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN alphabet a
        |  LEFT JOIN perdoc p ON p.doc_id = d.doc_id AND p.ch = a.ch
        |)
        |SELECT ch, round(avg(n), 4) AS mean_n, round(stddev_pop(n), 4) AS std_n
        |FROM dense GROUP BY ch ORDER BY ch""".stripMargin
  )
}
