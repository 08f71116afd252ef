package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk_words")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.6 T1 + §2.4 A1/A2 + §2.8 F1/F2: tokenize → count → top-k.
    "q_topk_words" -> ((s, dir) => TextOps.topKWords(Tables.documents(s, dir), 100)),
    // §2.4 A3 + §2.8 F3: per-letter mean/std-dev over dense per-doc counts.
    "q_char_hist" -> ((s, dir) => TextOps.charHistogram(Tables.documents(s, dir))),
    // §2.3 J4: set difference (custkeys with orders − high-balance custkeys).
    "q_set_diff" -> ((s, dir) => RelationalOps.setDifference(
      Tables.orders(s, dir).select(col("o_custkey").as("custkey")),
      Tables.customer(s, dir).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey")),
      "custkey").orderBy("custkey")),
    // §2.2 P5: one-pass hash-bucket sample + streaming-shaped agg.
    "q_hash_sample" -> ((s, dir) =>
      RelationalOps.hashBucketSample(Tables.events(s, dir), "user_id", 16, 3)
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 4).as("mean_value"),
          round(stddev_pop(col("value")), 4).as("std_value"))),
    // §2.3 J5 + §2.2 P6: two-pass sampler as a semi-join.
    "q_semi_sample" -> ((s, dir) =>
      RelationalOps.semiJoinSample(Tables.events(s, dir), "user_id", 16, 3)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_tx"), round(avg(col("value")), 4).as("mean_value"))
        .orderBy("user_id")),
    // §2.4 A5: deterministic last-rating-wins dedup.
    "q_dedup_last" -> ((s, dir) => Ratings.deduped(s, dir).orderBy("user_id", "item_id")),
    // §2.2 P3 + §2.4 A8: support filter (items with ≥25 distinct raters).
    "q_support_items" -> ((s, dir) => RelationalOps.supportFilter(
      Ratings.deduped(s, dir), "item_id", "user_id", 25).orderBy("item_id")),
    // §2.4 A7: distinct key collection.
    "q_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir).select("user_id").distinct().orderBy("user_id")),
    // §2.4 A4: single-pass Welford mean/std as a custom Aggregator (UDAF).
    "q_welford" -> ((s, dir) => {
      val welford = udaf(WelfordAgg)
      Tables.events(s, dir).groupBy("event_type")
        .agg(welford(col("value")).as("w"))
        .select(col("event_type"), col("w.n").as("n"),
          round(col("w.mean"), 4).as("mean_value"),
          round(col("w.std"), 4).as("std_value"))
        .orderBy("event_type")
    }),
    // §2.3 J3 + §2.4 A13: COO matrix multiply (equi-join on the inner
    // dim + hash agg). M = label<5 slice, N = transposed label>=5 slice;
    // vec_id bounded so the oracle output stays O(10^4) at every sf.
    "q_matmul" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
      val m = MatrixOps.embeddingsToCoo(emb.filter(col("label") < 5))
      val n = MatrixOps.embeddingsToCoo(emb.filter(col("label") >= 5))
        .select(col("j"), col("i").as("k"), col("v"))
      MatrixOps.multiply(m, n)
        .select(col("i"), col("k"), round(col("v"), 6).as("v"))
        .orderBy("i", "k")
    })
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
        |FROM dense GROUP BY ch ORDER BY ch""".stripMargin,
    "q_set_diff" ->
      """SELECT custkey FROM (
        |  (SELECT DISTINCT o_custkey AS custkey FROM orders)
        |  EXCEPT
        |  (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |) t ORDER BY custkey""".stripMargin,
    "q_hash_sample" ->
      """SELECT count(*) AS n, round(avg(value), 4) AS mean_value,
        |       round(stddev_pop(value), 4) AS std_value
        |FROM events WHERE (user_id * 2654435761) % 16 = 3""".stripMargin,
    "q_semi_sample" ->
      """SELECT user_id, count(*) AS n_tx, round(avg(value), 4) AS mean_value
        |FROM events WHERE user_id IN (
        |  SELECT DISTINCT user_id FROM events WHERE (user_id * 2654435761) % 16 = 3)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_dedup_last" ->
      s"""WITH ${Ratings.OracleDedupCte}
         |SELECT user_id, item_id, rating FROM ratings
         |ORDER BY user_id, item_id""".stripMargin,
    "q_support_items" ->
      s"""WITH ${Ratings.OracleDedupCte}
         |SELECT item_id, count(DISTINCT user_id) AS n_support
         |FROM ratings GROUP BY item_id
         |HAVING count(DISTINCT user_id) >= 25
         |ORDER BY item_id""".stripMargin,
    "q_distinct_users" ->
      "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q_welford" ->
      """SELECT event_type, count(value) AS n, round(avg(value), 4) AS mean_value,
        |       round(stddev_pop(value), 4) AS std_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_matmul" ->
      """WITH m AS (
        |  SELECT vec_id AS i, t.j, CAST(embedding[t.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(j) WHERE label < 5 AND vec_id < 100
        |), n AS (
        |  SELECT t.j, vec_id AS k, CAST(embedding[t.j + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(64) t(j) WHERE label >= 5 AND vec_id < 100
        |)
        |SELECT m.i, n.k, round(sum(m.v * n.v), 6) AS v
        |FROM m JOIN n ON m.j = n.j
        |GROUP BY m.i, n.k ORDER BY i, k""".stripMargin
  )
}
