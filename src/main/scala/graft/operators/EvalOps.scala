package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and distribution-monitoring operators — the
  * measurement half of a curation pipeline. Training a quality /
  * language / curation classifier (RegressionOps.logisticGd,
  * TextOps.naiveBayes) is only useful if the pipeline can also GRADE
  * it at corpus scale: ROC/AUC for threshold-free ranking quality,
  * calibration + ECE for "is the score a probability", NDCG for the
  * retrieval rankers (SimilarityOps.rrfFuse), and PSI drift for the
  * ongoing monitoring of every scored snapshot against a reference.
  *
  * Scale shape (shared by the whole family): one map-side-combined
  * aggregate keyed by a BOUNDED key (distinct score value, bin id,
  * query id) reduces the corpus to a metric-sized table; every window
  * and total after that runs over that tiny table, never the corpus.
  * The per-row scoring pass is scan-local. Nothing here holds
  * corpus-sized driver state.
  *
  * Determinism (the oracle contract): counts stay integer as long as
  * possible; every published rate is ONE IEEE division of exact
  * integers (correctly rounded on any engine) rounded to a fixed
  * scale; ln/log terms are rounded to 9 dp before the decimal-exact
  * sum (the repo-wide portable-transcendental pattern).
  */
object EvalOps {

  /** Exact ROC curve + tie-aware AUC for an integer-valued score
    * against a binary label — the Mann–Whitney rank-sum identity:
    * AUC = (S − P(P+1)/2) / (P·N) with S = Σ over positives of their
    * mid-rank (ties get the average rank). All rank arithmetic is
    * carried DOUBLED so it stays BIGINT-exact:
    * 2S = Σ_s npos_s · (2·cnt_lt_s + n_s + 1).
    *
    * Output: one row per distinct score (the threshold "predict
    * positive when score ≥ s"), with exact cumulative tp/fp counts,
    * tpr/fpr (one exact-integer IEEE division, 9 dp), and the global
    * `auc` repeated on every row (broadcast of a 1-row metric).
    *
    * Scale: the corpus reduces via ONE score-keyed partial-combined
    * aggregate; the cumulative windows and the AUC total run over the
    * distinct-score table only (bounded — integer scores), so the
    * single-partition window is metric-sized, never corpus-sized.
    */
  def rocAuc(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = scored
      .select(score.cast("long").as("score"), label.cast("long").as("y"))
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    val asc = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = byScore
      .withColumn("cum_le", sum("n").over(asc))
      .withColumn("cum_tp", sum("n_pos").over(desc))
      .withColumn("cum_fp", sum(col("n") - col("n_pos")).over(desc))
      // 2 × Σ mid-ranks of this score's positives (BIGINT-exact)
      .withColumn("s2_part",
        col("n_pos") * (lit(2L) * (col("cum_le") - col("n")) + col("n") + lit(1L)))
    val totals = ranked.agg(
      sum("n_pos").as("p_tot"),
      sum(col("n") - col("n_pos")).as("n_tot"),
      sum("s2_part").as("s2"))
      .withColumn("auc",
        round((col("s2") - col("p_tot") * (col("p_tot") + lit(1L))).cast("double") /
          (lit(2L) * col("p_tot") * col("n_tot")).cast("double"), 9))
    ranked.crossJoin(broadcast(totals.select("p_tot", "n_tot", "auc")))
      .select(col("score"), col("n"), col("n_pos"), col("cum_tp"), col("cum_fp"),
        round(col("cum_tp").cast("double") / col("p_tot").cast("double"), 9).as("tpr"),
        round(col("cum_fp").cast("double") / col("n_tot").cast("double"), 9).as("fpr"),
        col("auc"))
  }

  /** Reliability diagram + expected calibration error for a confidence
    * score in [0, 1) against a binary label. `conf` must already be a
    * deterministic 9-dp-rounded double (the caller owns score
    * portability); bins are equal-width. Per bin: empirical positive
    * rate (`acc`, one exact-int division), mean confidence (decimal
    * sum of the 9-dp confs ÷ count), and the bin's |acc − avg_conf|
    * gap. ECE = Σ n_b/N · gap_b is published on every row.
    *
    * The corpus reduces via ONE bin-keyed aggregate (≤ nBins rows);
    * ECE's total window runs over the bin table.
    */
  def calibration(scored: DataFrame, conf: Column, label: Column,
      nBins: Int = 10): DataFrame = {
    val binned = scored.select(conf.as("conf"), label.cast("long").as("y"))
      .withColumn("bin",
        least(floor(col("conf") * lit(nBins.toDouble)), lit(nBins - 1L)).cast("long"))
    val byBin = binned.groupBy("bin").agg(
      count(lit(1)).as("n"),
      sum("y").as("n_pos"),
      sum(col("conf").cast("decimal(28,12)")).as("conf_sum"))
      .withColumn("acc",
        round(col("n_pos").cast("double") / col("n").cast("double"), 9))
      .withColumn("avg_conf",
        round(col("conf_sum").cast("double") / col("n").cast("double"), 9))
      .withColumn("gap", round(abs(col("acc") - col("avg_conf")), 9))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byBin
      .withColumn("ece",
        round(sum(round(col("gap") * col("n").cast("double"), 6)
            .cast("decimal(28,12)")).over(all)
          .cast("double") / sum("n").over(all).cast("double"), 9))
      .select("bin", "n", "n_pos", "acc", "avg_conf", "gap", "ece")
  }

  /** NDCG@k of a ranking against graded relevance (Järvelin &
    * Kekäläinen 2002). `ranking` is (q_id, nn_id, pos) — the system
    * order under evaluation; `rels` is (q_id, nn_id, rel) with integer
    * gains. DCG = Σ_{pos ≤ k} (2^rel − 1) · 1/log2(pos+1); IDCG is the
    * same formula over this query's rels sorted descending. Per-term
    * portability: the gain is an exact integer, the discount is
    * round(1/log2(pos+1), 9), their product is one IEEE multiply
    * re-rounded to 9 dp, and the per-query sums are decimal-exact.
    * ndcg = one IEEE division of the two sums, 6 dp.
    *
    * Scale: both sides are already top-k-bounded per query (k·|Q|
    * rows); the rel join is q-and-doc-keyed; the ideal ranking's sort
    * window partitions BY QUERY (never global). Queries with no
    * relevant docs publish ndcg = null rather than 0/0.
    */
  def ndcgAtK(ranking: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    def discount(pos: Column): Column =
      round(lit(1.0) / log2(pos.cast("double") + lit(1.0)), 9)
    // 2^rel − 1 for small integer rel (exact in double, then BIGINT)
    def gain(rel: Column): Column =
      pow(lit(2.0), rel.cast("double")).cast("long") - lit(1L)
    val sys = ranking.filter(col("pos") <= k)
      .join(rels, Seq("q_id", "nn_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .withColumn("term",
        round(gain(col("rel")).cast("double") * discount(col("pos")), 9))
    val dcg = sys.groupBy("q_id").agg(
      sum(col("term").cast("decimal(28,12)")).as("dcg_sum"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel_ranked"))
    val iw = Window.partitionBy("q_id").orderBy(col("rel").desc, col("nn_id"))
    val ideal = rels.filter(col("rel") > 0)
      .withColumn("ipos", row_number().over(iw))
      .filter(col("ipos") <= k)
      .withColumn("term",
        round(gain(col("rel")).cast("double") * discount(col("ipos")), 9))
      .groupBy("q_id").agg(
        sum(col("term").cast("decimal(28,12)")).as("idcg_sum"),
        count(lit(1)).as("n_rel"))
    dcg.join(ideal, Seq("q_id"), "left")
      .select(col("q_id"),
        round(col("dcg_sum").cast("double"), 6).as("dcg"),
        round(col("idcg_sum").cast("double"), 6).as("idcg"),
        when(col("idcg_sum").isNotNull,
          round(col("dcg_sum").cast("double") / col("idcg_sum").cast("double"), 6))
          .as("ndcg"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_rel_ranked"))
  }

  /** Population-stability-index drift between a reference and a
    * current corpus snapshot over a pre-binned feature — the standard
    * production monitor for "did the input distribution move" (PSI
    * < 0.1 stable / 0.1–0.25 drifting / > 0.25 shifted). Laplace
    * add-one keeps every bin's probability integer-exact before its
    * single IEEE division: p = (cnt+1)/(N+nBins), term =
    * round((pa−pb)·ln(pa/pb), 9), decimal-summed.
    *
    * Each side reduces via ONE bin-keyed partial-combined aggregate;
    * the full-outer bin merge and the PSI total run over ≤ nBins rows.
    */
  def psi(ref: DataFrame, cur: DataFrame, bin: Column, nBins: Int): DataFrame = {
    def binCounts(df: DataFrame, side: String): DataFrame =
      df.select(bin.cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(s"cnt_$side"))
    val merged = binCounts(ref, "ref").join(binCounts(cur, "cur"), Seq("bin"), "full")
      .na.fill(0L, Seq("cnt_ref", "cnt_cur"))
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val probs = merged
      .withColumn("p_ref",
        round((col("cnt_ref") + lit(1L)).cast("double") /
          (sum("cnt_ref").over(all) + lit(nBins.toLong)).cast("double"), 9))
      .withColumn("p_cur",
        round((col("cnt_cur") + lit(1L)).cast("double") /
          (sum("cnt_cur").over(all) + lit(nBins.toLong)).cast("double"), 9))
      .withColumn("term",
        round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 9))
    probs
      .withColumn("psi",
        round(sum(col("term").cast("decimal(28,12)")).over(all).cast("double"), 9))
      .select("bin", "cnt_ref", "cnt_cur", "p_ref", "p_cur", "term", "psi")
  }

  /** Lorenz curve + exact Gini concentration of an integer mass
    * (tokens per document) — the data-card answer to "what fraction of
    * the corpus' tokens sits in its largest documents". Grouped exact
    * formula over distinct values v_1 < v_2 < …:
    * G = 1 − Σ_i f_i·(2·S_{i−1} + s_i) / (N·T), with f_i the count at
    * value i, s_i = f_i·v_i its mass and S the cumulative mass — the
    * tie-correct population Gini, all BIGINT until one final division.
    *
    * Same scale shape as [[rocAuc]]: the corpus reduces via ONE
    * value-keyed aggregate; the cumulative window and the total run
    * over the distinct-value table (bounded by the max document
    * length, never corpus-sized). Output: one Lorenz point per
    * distinct value with the global `gini` on every row.
    */
  def lorenzGini(df: DataFrame, value: Column): DataFrame = {
    val byVal = df.select(value.cast("long").as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("mass", col("v") * col("n_rows"))
    val asc = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byVal
      .withColumn("cum_rows", sum("n_rows").over(asc))
      .withColumn("cum_mass", sum("mass").over(asc))
      .withColumn("g_part",
        col("n_rows") * (lit(2L) * (col("cum_mass") - col("mass")) + col("mass")))
    val totals = cum.agg(sum("n_rows").as("n_tot"), sum("mass").as("t_tot"),
        sum("g_part").as("g_num"))
      .withColumn("gini",
        round(lit(1.0) - col("g_num").cast("double") /
          (col("n_tot") * col("t_tot")).cast("double"), 9))
    cum.crossJoin(broadcast(totals.select("n_tot", "t_tot", "gini")))
      .select(col("v"), col("n_rows"), col("mass"), col("cum_rows"), col("cum_mass"),
        round(col("cum_rows").cast("double") / col("n_tot").cast("double"), 9)
          .as("lorenz_p"),
        round(col("cum_mass").cast("double") / col("t_tot").cast("double"), 9)
          .as("lorenz_l"),
        col("gini"))
  }

  /** Per-group PSI against a shared static reference — the grouped
    * form of [[psi]] for monitoring MANY snapshots at once (one per
    * time window, shard, or source). `cur` is (grp, bin, cnt) — e.g.
    * the output of a streaming windowed bin count — and `ref` is
    * (bin, cnt_ref). The bin axis is the REFERENCE's: when the
    * reference is the full corpus and each group is a subset of it
    * (the monitoring shape), every group bin is a reference bin by
    * construction; absent (grp, bin) cells count 0 and Laplace
    * add-one keeps them finite.
    *
    * Scale: both inputs are already bin-reduced; the group×bin axis
    * is |groups|·nBins rows (the reference broadcasts), and every
    * window partitions BY GROUP. Nothing corpus-sized.
    */
  def psiByGroup(cur: DataFrame, ref: DataFrame, nBins: Int): DataFrame = {
    val refTot = ref.agg(sum("cnt_ref").as("n_ref"))
    val axis = cur.select("grp").distinct()
      .crossJoin(broadcast(ref))
    val merged = axis.join(cur, Seq("grp", "bin"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(refTot))
    val perGrp = Window.partitionBy("grp")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val probs = merged
      .withColumn("p_cur",
        round((col("cnt") + lit(1L)).cast("double") /
          (sum("cnt").over(perGrp) + lit(nBins.toLong)).cast("double"), 9))
      .withColumn("p_ref",
        round((col("cnt_ref") + lit(1L)).cast("double") /
          (col("n_ref") + lit(nBins.toLong)).cast("double"), 9))
      .withColumn("term",
        round((col("p_ref") - col("p_cur")) * log(col("p_ref") / col("p_cur")), 9))
    probs
      .withColumn("psi",
        round(sum(col("term").cast("decimal(28,12)")).over(perGrp).cast("double"), 9))
      .select("grp", "bin", "cnt", "cnt_ref", "p_cur", "p_ref", "term", "psi")
  }

  /** kNN label-agreement noise detection (the classic edited-nearest-
    * neighbor / Confident-Learning-style screen): a labeled point whose
    * k nearest neighbors mostly DISAGREE with its label is a likely
    * mislabel — surfaced for re-annotation before training. Output per
    * node: its label, the neighbor vote counts, the agreement
    * fraction, and `suspect` (strict-minority agreement).
    *
    * Built on the exact directed kNN lists ([[SimilarityOps]]); the
    * label lookup is one id-keyed equi-join of the k·n list table
    * against the (id, label) projection, and the vote is one
    * node-keyed aggregate. At corpus scale, feed the same join from
    * ANN lists — the vote shape is unchanged.
    */
  def labelNoise(knnLists: DataFrame, labels: DataFrame): DataFrame = {
    val lbl = labels.select(col("vec_id"), col("label"))
    val withQ = knnLists
      .join(lbl.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "label_q"), Seq("q_id"))
      .join(lbl.withColumnRenamed("vec_id", "nn_id")
        .withColumnRenamed("label", "label_n"), Seq("nn_id"))
    withQ.groupBy(col("q_id").as("vec_id"))
      .agg(
        first(col("label_q")).as("label"),
        count(lit(1)).as("n_neighbors"),
        sum(when(col("label_n") === col("label_q"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("agree_frac",
        round(col("n_agree").cast("double") / col("n_neighbors").cast("double"), 9))
      .withColumn("suspect", lit(2L) * col("n_agree") < col("n_neighbors"))
  }
}
