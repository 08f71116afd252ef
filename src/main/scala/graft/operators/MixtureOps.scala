package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture operators for training-corpus assembly: given a target
  * mixture over domains (sources), compute per-domain sampling weights
  * against the corpus' ACTUAL mass distribution, and materialize a
  * resampled corpus that realizes the target — the "data mixing" step
  * every large-scale pretraining pipeline runs between curation and
  * tokenization (domain reweighting à la The Pile / DoReMi-style fixed
  * mixtures).
  *
  * Scale shape: the per-domain mass aggregate is ONE map-side-combined
  * shuffle keyed by domain (domain cardinality is tiny — tens to
  * thousands — so the post-agg table is driver-negligible and the
  * weight table re-joins to the corpus as a BROADCAST). The resample
  * step is then map-only: every row computes its copy count from the
  * broadcast weight and a deterministic per-doc hash, and an explode
  * emits the copies — no wide exchange touches the corpus itself.
  *
  * Determinism: the fractional part of a weight is realized by
  * hash-thresholding (Knuth multiplicative hash scaled to [0,1), the
  * same construction as [[RelationalOps.hashBucketSample]]), so the
  * resampled corpus is a pure function of (corpus, targets) —
  * re-runnable, auditable, and oracle-checkable, unlike rand()-based
  * sampling. Expected realized mass per domain = target exactly.
  */
object MixtureOps {

  /** Deterministic uniform in [0, 1): Knuth multiplicative hash of a
    * non-negative id, scaled. k/2^32 is exact in double, so every
    * engine computes the identical value.
    */
  def hashUnit(id: Column): Column =
    (id * lit(2654435761L)) % lit(4294967296L) / lit(4294967296.0)

  /** Per-domain mixture weights. `targets` maps domain → target mass
    * fraction (a mixture config — small, driver-side by nature);
    * domains absent from the map get target 0 (dropped on resample).
    * Output per domain: n_docs, mass (Σ `massCol` — chars here, tokens
    * in a real pipeline), actual_frac, target_frac, and
    * weight = target_frac · total_mass / mass — the expected number of
    * epochs of that domain in the realized mixture (< 1 downsamples,
    * > 1 upsamples).
    *
    * The over-the-agg window total is fine at any corpus scale: it runs
    * on the POST-aggregate table (one row per domain), not the corpus.
    */
  def mixtureWeights(docs: DataFrame, targets: Map[String, Double],
      domainCol: String = "source", massCol: String = "n_chars"): DataFrame = {
    val perDomain = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col(massCol)).as("mass"))
    val total = sum(col("mass")).over(Window.partitionBy())
    val targetFrac = coalesce(
      element_at(typedLit(targets), col("domain")), lit(0.0))
    perDomain
      .withColumn("actual_frac", col("mass").cast("double") / total)
      .withColumn("target_frac", targetFrac)
      // association order matters for bit-parity with the oracle:
      // (target_frac * total) / mass, left to right
      .withColumn("weight", col("target_frac") * total / col("mass"))
  }

  /** Materialize the target mixture: each doc is emitted
    * floor(weight) + [hashUnit(doc) < frac(weight)] times, so the
    * EXPECTED mass of each domain equals its target fraction and the
    * realization is deterministic per doc. Output: one row per copy
    * (doc_id, domain, copy_no) — the downstream tokenizer treats copies
    * as independent rows. Weight-0 domains disappear; weights > 1
    * duplicate (epoch-style upsampling).
    *
    * The weight table is tiny (one row per domain) and BROADCASTS; the
    * corpus side stays map-only through the copy explode.
    */
  def mixtureResample(docs: DataFrame, targets: Map[String, Double],
      idCol: String = "doc_id", domainCol: String = "source",
      massCol: String = "n_chars"): DataFrame = {
    val w = broadcast(
      mixtureWeights(docs, targets, domainCol, massCol).select("domain", "weight"))
    val copies = (floor(col("weight")) +
      when(hashUnit(col(idCol)) < col("weight") - floor(col("weight")), 1L)
        .otherwise(0L)).cast("long")
    docs.join(w, docs(domainCol) === w("domain"))
      .withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1L)
      .select(col(idCol), col("domain"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_no"))
  }

  /** Survey raking / iterative proportional fitting (Deming &
    * Stephan 1940) over a two-way cell table — reweight the corpus so
    * BOTH margins match uniform targets simultaneously (the
    * two-dimensional generalization of [[mixtureWeights]]'s single
    * domain axis): the language-×-source rebalance a curation
    * pipeline runs when upsampling one axis must not skew the other.
    *
    * `rounds` alternating half-steps scale each row to the row
    * target, then each column to the column target. Exactness: the
    * whole iteration runs in scale-9 INTEGER weight lanes — targets
    * are half-up integers N·10⁹/L and N·10⁹/C, every rescale is the
    * exact half-up rational w·T/Σw (hugeint/BigInt floor arithmetic
    * both engines), so there is no float anywhere and the oracle
    * unrolls identical half-steps as chained CTEs. Structural zeros
    * (unobserved cells) stay zero — standard IPF semantics; with
    * them the margins converge to the closest achievable fit, and
    * the gate pins the REPLAY, not an idealized limit.
    *
    * Plan shape: corpus → ONE (row, col) combine; the cell table
    * (margin-cardinality², bounded by design) is collected
    * driver-side (the stationary-distribution precedent) and the
    * BigInt rounds cost microseconds. Output: (rowCol, colCol, n,
    * w_micro9 — the exact scale-9 integer weight, w).
    */
  def rakeWeights(docs: DataFrame, rowCol: String = "lang",
      colCol: String = "source", rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val spark = docs.sparkSession
    val S = BigInt(1000000000L)
    val halfUp = graft.PlanUtils.halfUpBig _
    val cells = docs.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val rows = cells.map(_._1).distinct.sorted
    val cols = cells.map(_._2).distinct.sorted
    val n = BigInt(cells.map(_._3).sum)
    val tr = if (rows.nonEmpty) halfUp(n * S, BigInt(rows.length)) else BigInt(0)
    val tc = if (cols.nonEmpty) halfUp(n * S, BigInt(cols.length)) else BigInt(0)
    var w = cells.map { case (r, c, cnt) => ((r, c), BigInt(cnt) * S) }.toMap
    for (_ <- 1 to rounds) {
      val rs = w.groupBy(_._1._1).map { case (r, m) => r -> m.values.sum }
      w = w.map { case ((r, c), v) =>
        ((r, c), if (rs(r) > 0) halfUp(v * tr, rs(r)) else BigInt(0))
      }
      val cs = w.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
      w = w.map { case ((r, c), v) =>
        ((r, c), if (cs(c) > 0) halfUp(v * tc, cs(c)) else BigInt(0))
      }
    }
    import spark.implicits._
    cells.map { case (r, c, cnt) => (r, c, cnt, w((r, c)).toLong) }
      .toSeq.toDF(rowCol, colCol, "n", "w_micro9")
      .select(col(rowCol), col(colCol), col("n"), col("w_micro9"),
        (col("w_micro9").cast("double") / lit(1e9)).as("w"))
  }
}
