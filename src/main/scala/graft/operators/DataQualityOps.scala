package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** k-ary generalized randomized response (Warner 1965 / GRR): each
    * row reports its TRUE category with probability p = 3/4, else a
    * deterministic-"random" one of the other k−1 — the LOCAL-DP
    * collection mechanism (ε = ln(p(k−1)/(1−p))) — then the collector
    * debiases the reported counts:
    *   π̂_j = (f_j/n − q)/(p − q),  q = (1−p)/(k−1)
    *        = (4(k−1)·f_j − n) / (n·(3k−4))   at p = 3/4,
    * one IEEE division of exact int64 terms. True counts are published
    * next to the estimate — the certificate showing the estimator's
    * realized error. Complements [[dpNoisyCounts]] (central DP: exact
    * counts + output noise) with the collection-side mechanism.
    *
    * Randomness is md5-seeded per ROW id (the [[RelationalOps
    * .hashUniform]] contract): honesty from 2 hash bits, the lie drawn
    * uniformly over the other categories by a second hash lane — fully
    * replayable in the oracle. k < 2 (nothing to lie about) publishes
    * NULL estimates.
    *
    * Plan shape: the category table (k rows, broadcast) indexes both
    * the true and lie categories; the corpus reduces in ONE
    * category-keyed aggregate of reported/true counts. Output:
    * (cat, n_true, n_reported, pi_hat).
    */
  def rrFrequency(df: DataFrame, idCol: Column, catCol: Column,
      seed: String): DataFrame = {
    val cats = df.select(catCol.as("cat")).distinct()
      .withColumn("idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("cat")).cast("long") - 1L)
    val k = cats.agg(count(lit(1)).as("k"))
    val h = md5(concat_ws("|", col("id").cast("string"), lit(seed)).cast("binary"))
    val base = df.select(idCol.as("id"), catCol.as("cat"))
      .withColumn("__h1", conv(substring(h, 1, 6), 16, 10).cast("long"))
      .withColumn("__h2", conv(substring(h, 7, 6), 16, 10).cast("long"))
      .join(broadcast(cats), Seq("cat"))
      .crossJoin(broadcast(k))
      .withColumn("rep_idx",
        when(col("k") < 2L || pmod(col("__h1"), lit(4L)) < 3L, col("idx"))
          .otherwise(pmod(col("idx") + 1L + pmod(col("__h2"), col("k") - 1L),
            col("k"))))
    val reported = base.groupBy("rep_idx")
      .agg(count(lit(1)).as("n_reported"))
      .withColumnRenamed("rep_idx", "idx")
    val truth = base.groupBy("idx").agg(count(lit(1)).as("n_true"))
    val n = df.agg(count(lit(1)).as("n"))
    cats.join(truth, Seq("idx"), "left")
      .join(reported, Seq("idx"), "left")
      .crossJoin(broadcast(n)).crossJoin(broadcast(k))
      .select(col("cat"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_reported"), lit(0L)).as("n_reported"),
        when(col("k") >= 2L,
          graft.PlanUtils.ratioRound(
            lit(4L) * (col("k") - 1L)
              * coalesce(col("n_reported"), lit(0L)) - col("n"),
            col("n") * (lit(3L) * col("k") - 4L), 6) + 0.0)
          .as("pi_hat"))
  }

  /** Exact equi-depth histogram boundaries — the planning primitive
    * behind range partitioning, sort-merge split points, and balanced
    * shard layout: boundary_i is the smallest value whose cumulative
    * count reaches ⌈i·N/nBuckets⌉ (all BIGINT rank arithmetic).
    * Realized per-bucket counts are published next to the target depth
    * — with heavy duplicate values buckets CAN be uneven, and seeing
    * by how much is the point (it is exactly the skew a range
    * partitioner on this key would inherit).
    *
    * Scale: one value-keyed partial-combined aggregate reduces the
    * corpus; boundary selection and bucket assembly run on the
    * distinct-value table with the (nBuckets−1)-row boundary table
    * broadcast. Output: one row per bucket with [lo, hi) bounds
    * (null-open at the ends).
    */
  def equiDepth(df: DataFrame, value: Column, nBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byVal = df.select(value.cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
    val asc = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byVal.withColumn("cum", sum("n").over(asc))
    val tot = cum.agg(sum("n").as("n_total"))
    val ranks = (1 until nBuckets).toDF("i")
      .crossJoin(broadcast(tot))
      .withColumn("r", expr(s"(i * n_total + $nBuckets - 1) div $nBuckets"))
    // boundary_i = min v with cum ≥ ⌈i·N/nB⌉
    val bounds = ranks.crossJoin(cum)
      .groupBy("i", "n_total")
      .agg(min(when(col("cum") >= col("r"), col("v"))).as("b"))
    // bucket(v) = number of boundaries strictly below v
    val bucketed = cum.crossJoin(broadcast(bounds.select("b")))
      .groupBy("v", "n")
      .agg(sum(when(col("v") > col("b"), 1L).otherwise(0L)).as("bucket"))
      .groupBy("bucket")
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_values"))
    val lohi = bounds.select(col("i"), col("b"))
    bucketed
      .join(lohi.select((col("i") - 1).as("bucket"), col("b").as("hi")),
        Seq("bucket"), "left")
      .join(lohi.select(col("i").as("bucket"), col("b").as("lo")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"), col("lo"), col("hi"), col("n_rows"), col("n_values"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 9)
          .as("depth_frac"))
  }

  /** Hot-key skew diagnostics — the pre-shuffle observability report
    * that tells a pipeline WHEN to flip its skew hatches (salting,
    * [[CFOps]] saltedSupport, AQE skew thresholds): the top-k heaviest
    * keys with each key's share of all rows and its ratio to the mean
    * rows-per-key. One key-keyed aggregate reduces the corpus; the
    * top-k rides TakeOrdered on the key table; totals broadcast.
    */
  /** k-anonymity release via a fixed GENERALIZATION LADDER (the
    * Samarati/Sweeney suppression scheme, Mondrian-lite): group rows
    * by the full quasi-identifier pair (q1, q2); groups of size ≥ k
    * release as-is (level 0). Undersized groups generalize q2 → 'ANY'
    * and re-group by q1 alone (level 1); still-undersized residue
    * collapses to the fully-generalized ('ANY', 'ANY') bucket
    * (level 2, released whatever its size — it carries no
    * quasi-identifier). Release guarantee: every published row with a
    * live quasi-identifier aggregates ≥ k individuals.
    *
    * Three hash aggregates, each over the PREVIOUS level's group
    * table (≤ |q1×q2| rows — group-space-, not corpus-sized), so
    * cost after the first aggregate is independent of row count; no
    * driver state. Output: (q1, q2, n, level) with generalized cells
    * as the literal 'ANY'.
    */
  def kAnonymize(df: DataFrame, q1: Column, q2: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val g0 = df.groupBy(q1.cast("string").as("q1"), q2.cast("string").as("q2"))
      .agg(count(lit(1)).as("n"))
    val rel0 = g0.filter(col("n") >= k)
      .select(col("q1"), col("q2"), col("n"), lit(0).as("level"))
    val g1 = g0.filter(col("n") < k)
      .groupBy("q1").agg(sum("n").as("n"))
    val rel1 = g1.filter(col("n") >= k)
      .select(col("q1"), lit("ANY").as("q2"), col("n"), lit(1).as("level"))
    val rel2 = g1.filter(col("n") < k)
      .agg(sum("n").as("n")).filter(col("n").isNotNull)
      .select(lit("ANY").as("q1"), lit("ANY").as("q2"), col("n"),
        lit(2).as("level"))
    rel0.unionByName(rel1).unionByName(rel2)
  }

  /** Distinct l-diversity audit (Machanavajjhala et al. 2006) — the
    * companion check to [[kAnonymize]]: k-anonymity bounds GROUP SIZE,
    * but a group whose sensitive attribute is constant still leaks it
    * (the homogeneity attack). For every quasi-identifier group this
    * reports the group size, the number of DISTINCT sensitive values,
    * the most frequent sensitive value's count (the skew the
    * probabilistic variants bound), and whether the group meets
    * distinct l-diversity (`n_sensitive >= l`).
    *
    * Plan shape: one (q1, q2, sensitive)-keyed partial-combined
    * aggregate reduces the corpus to the sensitive-value histogram;
    * the per-group rollup (count / max) runs over that table —
    * group-space-sized, never corpus-sized; no driver state.
    */
  def lDiversity(df: DataFrame, q1: Column, q2: Column, sensitive: Column,
      l: Int): DataFrame = {
    require(l >= 1, "l must be >= 1")
    val h = df.groupBy(q1.cast("string").as("q1"), q2.cast("string").as("q2"),
        sensitive.cast("string").as("s"))
      .agg(count(lit(1)).as("ns"))
    h.groupBy("q1", "q2")
      .agg(sum("ns").as("n"), count(lit(1)).as("n_sensitive"),
        max("ns").as("top_sensitive_n"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    * distribution-attack check [[lDiversity]] misses: a group can hold
    * l distinct sensitive values yet still leak (e.g. all of them in
    * the top income decile). For an ORDERED sensitive attribute the
    * prescribed distance is Earth-Mover's over the ordered bins, which
    * collapses to mean |ECDF_group − ECDF_global|:
    * EMD = Σ_{b<B} |cum_g(b)/N_g − cum(b)/N| / (B−1).
    *
    * Exactness: each term is carried CROSS-MULTIPLIED as the BIGINT
    * |cum_g·N − cum·N_g| (the [[EvalOps.ksDrift]] device) and summed
    * in DECIMAL(38,0); the published emd does ONE IEEE division at the
    * end, rounded 9 dp, and the t-flag is decided on that published
    * value.
    *
    * Scale shape: corpus → one (q1,q2,bin)-keyed combine; the group ×
    * bin grid (group-space-sized, never corpus-sized) is rebuilt by
    * crossing distinct groups with the BROADCAST global bin axis so
    * every group's ECDF is evaluated on the full axis (a group missing
    * a bin still steps the global cumulative there).
    */
  def tCloseness(df: DataFrame, q1: Column, q2: Column, sensitiveBin: Column,
      t: Double): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(q1.cast("string").as("q1"), q2.cast("string").as("q2"),
        sensitiveBin.cast("long").as("b"))
      .groupBy("q1", "q2", "b").agg(count(lit(1)).as("n_cell"))
    val globalBins = cells.groupBy("b").agg(sum("n_cell").as("n_bin"))
    val asc = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // global axis is bin-count-sized: the global windows are bounded
    val globalCum = globalBins
      .withColumn("cum", sum("n_bin").over(asc))
      .withColumn("n_total", sum("n_bin").over(all))
      .withColumn("n_bins", count(lit(1)).over(all))
      .select("b", "cum", "n_total", "n_bins")
    val grid = cells.select("q1", "q2").distinct()
      .crossJoin(broadcast(globalCum))
      .join(cells, Seq("q1", "q2", "b"), "left")
      .na.fill(0L, Seq("n_cell"))
    val gAsc = Window.partitionBy("q1", "q2").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gAll = Window.partitionBy("q1", "q2")
    val withCum = grid
      .withColumn("cum_g", sum("n_cell").over(gAsc))
      .withColumn("n_g", sum("n_cell").over(gAll))
    withCum.groupBy("q1", "q2")
      .agg(first("n_g").as("n"),
        first("n_total").as("n_total"), first("n_bins").as("n_bins"),
        // last bin's |ECDF diff| is 0 by construction; excluding it via
        // the cum < total filter equals dividing by (B-1)
        sum(when(col("cum") < col("n_total"),
          abs(col("cum_g").cast(dec) * col("n_total")
            - col("cum").cast(dec) * col("n_g"))).otherwise(lit(0).cast(dec)))
          .as("emd_num"))
      .withColumn("emd",
        round(col("emd_num").cast("double") /
          (col("n").cast("double") * col("n_total").cast("double")
            * (col("n_bins") - 1).cast("double")), 9))
      .select(col("q1"), col("q2"), col("n"), col("emd"),
        (col("emd") <= t).as("t_close"))
  }

  /** Benford first-digit conformance check — the fraud/synthetic-data
    * screen: natural multi-scale positive quantities put first digit d
    * at share log10(1+1/d); a generated or tampered column deviates.
    * χ² = Σ_d (n_d − N·p_d)²/(N·p_d) against the df=8 critical value.
    *
    * Portability: the first digit comes from the BIGINT floor's string
    * form (integers print identically everywhere — never from double
    * formatting); p_d = ln(1+1/d)/ln(10) is rounded 9 dp (the repo's
    * portable-transcendental pattern) so every χ² term is a fixed IEEE
    * dag on exact counts and identical constants, rounded 9 dp and
    * summed over the 9-digit axis (digit-count-sized — the per-group
    * window is bounded).
    *
    * Scale shape: corpus → one (group, digit)-keyed combine; the 9-row
    * digit axis is rebuilt per group by crossing distinct groups with
    * a broadcast literal range so absent digits count as n_d = 0.
    */
  def benfordCheck(df: DataFrame, group: Column, value: Column,
      chi2Crit: Double = 15.507): DataFrame = {
    val spark = df.sparkSession
    val digitAxis = broadcast(spark.range(1, 10).select(col("id").as("digit")))
    val counts = df.select(group.cast("string").as("grp"),
        value.cast("double").as("v"))
      .filter(col("v") >= 1.0)
      .select(col("grp"),
        substring(floor(col("v")).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
      .groupBy("grp", "digit").agg(count(lit(1)).as("n_d"))
    val grid = counts.select("grp").distinct().crossJoin(digitAxis)
      .join(counts, Seq("grp", "digit"), "left")
      .na.fill(0L, Seq("n_d"))
    val g = Window.partitionBy("grp")
    val pD = round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 9)
    val withN = grid.withColumn("n", sum("n_d").over(g))
      .withColumn("p_d", pD)
      .withColumn("share",
        round(col("n_d").cast("double") / col("n").cast("double"), 9))
      .withColumn("chi2_term",
        round((col("n_d") - col("n") * col("p_d"))
          * (col("n_d") - col("n") * col("p_d"))
          / (col("n") * col("p_d")), 9).cast("decimal(38,9)"))
    withN
      .withColumn("chi2",
        round(sum("chi2_term").over(g).cast("double"), 6))
      .select(col("grp"), col("digit"), col("n_d"), col("share"),
        col("p_d").as("benford_p"), col("chi2"),
        (col("chi2") > chi2Crit).as("deviates"))
  }

  def skewReport(df: DataFrame, key: Column, k: Int): DataFrame = {
    val counts = df.select(key.as("key")).groupBy("key")
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("n_total"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(k)
    val w = Window.orderBy(col("n").desc, col("key"))
    top.withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("key"), col("n"),
        round(col("n").cast("double") / col("n_total").cast("double"), 9)
          .as("share"),
        round((col("n") * col("n_keys")).cast("double") /
          col("n_total").cast("double"), 9).as("skew_vs_mean"),
        col("n_total"), col("n_keys"))
  }

  /** Hill tail-index estimator (Hill 1975) of the per-key activity
    * distribution, per group — "HOW heavy is the hot-key tail":
    * [[skewReport]] names the hot keys; the Hill α̂ quantifies the
    * power-law exponent they follow (α̂ ≈ 1 → Zipf-like, salting
    * mandatory; α̂ large → light tail, plain hash partitioning holds)
    * — the number behind every salting/AQE-skew sizing decision.
    * Over the top-k order statistics x₍₁₎ ≥ … ≥ x₍ₖ₎ with reference
    * x₍ₖ₊₁₎: H = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎), α̂ = 1/H.
    *
    * Portability: order statistics come from the deterministic
    * (count desc, key) total order; each ln ratio quantizes straight
    * to a nano-unit integer t = round(ln(xᵢ/x_ref)·10⁹) (identical
    * doubles in, identical ints out), Σt is an exact int64 and both
    * H and α̂ publish as half-up rationals over (Σt, k·10⁹). An
    * all-ties head (Σt = 0) nulls α̂; a group with fewer than k+1
    * keys has no x₍ₖ₊₁₎ and is dropped (no estimate exists).
    *
    * Plan shape: corpus → one (grp, key) combine; the rank window
    * runs over the key-cardinality table per group and everything
    * after is k-sized. Output: (grp, k, x_ref, hill_h, alpha).
    */
  def hillTailIndex(df: DataFrame, group: Column, key: Column,
      k: Int = 100): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val counts = df.select(group.as("grp"), key.as("key"))
      .groupBy("grp", "key").agg(count(lit(1)).as("f"))
    val w = Window.partitionBy("grp").orderBy(col("f").desc, col("key"))
    val top = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k + 1)
    val ref = top.filter(col("rn") === k + 1)
      .select(col("grp"), col("f").as("x_ref"))
    val t = expr("CAST(round(ln(CAST(f AS DOUBLE) / x_ref) * 1000000000) AS BIGINT)")
    top.filter(col("rn") <= k).join(ref, Seq("grp"))
      .groupBy("grp")
      .agg(first(col("x_ref")).as("x_ref"), sum(t).as("sum_t"))
      .select(col("grp"), lit(k.toLong).as("k"), col("x_ref"),
        (graft.PlanUtils.ratioRound(col("sum_t"),
          lit(k.toLong) * lit(1000000000L), 6) + 0.0).as("hill_h"),
        when(col("sum_t") > 0, graft.PlanUtils.ratioRound(
          lit(k.toLong) * lit(1000000000L), col("sum_t"), 6) + 0.0)
          .as("alpha"))
  }
}
