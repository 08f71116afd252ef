package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Measures what the q_cosine_neardup gate cannot: LSH PRUNING. The
  * driver's embeddings are near-orthogonal by construction (intra ≈
  * cross ≈ 0), so every ≥ 0.4 pair sits AT the threshold and the gate's
  * permissive 12×6-bit×r2 config — chosen so the equality oracle holds —
  * is necessarily ≈ brute force there (round-6 verdict finding #1). On a
  * corpus with real cluster structure there is a similarity GAP around
  * the threshold, and a tighter scale config must do BOTH: reproduce the
  * exact answer AND visit a small fraction of all pairs. This spec pins
  * both properties on a deterministic clustered corpus.
  */
class CosineLshPruningSpec extends SparkSpec {
  import spark.implicits._

  test("clustered corpus: 16x16-bit r2 LSH is exact at >=5x candidate reduction") {
    // Deterministic clustered corpus — the GenScale embedding recipe
    // with tighter noise: 2000 × 64-d, 10 Gaussian clusters (center
    // σ 0.2/dim, noise σ 0.055/dim) → intra-cluster cos ≳ 0.9,
    // cross-cluster cos ≲ 0.3: qualifying (≥ 0.4) pairs are exactly
    // the intra-cluster ones, with a wide margin on both sides.
    def rng(id: Long, salt: Long) =
      new java.util.Random(id * 6364136223846793005L + salt)
    val emb = (0L until 2000L).map { id =>
      val label = (id % 10).toInt
      val rc = rng(label.toLong, 29L)
      val center = Array.fill(64)(rc.nextGaussian() * 0.2)
      val rn = rng(id, 31L)
      (id, center.map(c => (c + rn.nextGaussian() * 0.055).toFloat).toSeq)
    }.toDF("vec_id", "embedding")

    val exact = SimilarityOps.cosineNearDups(emb, 0.4)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(exact.size > 100000, s"corpus degenerate: ${exact.size} true pairs")

    val nCand = SimilarityOps.lshCandidatePairs(emb,
      tables = 16, bitsPerTable = 16, probeRadius = 2).count()
    val lsh = SimilarityOps.cosineNearDupsLsh(emb, 0.4,
      tables = 16, bitsPerTable = 16, probeRadius = 2)
      .select("va", "vb").as[(Long, Long)].collect().toSet

    // (a) recall proof: the scale config loses nothing on this corpus
    assert(lsh == exact,
      s"LSH missed ${(exact -- lsh).size} / extra ${(lsh -- exact).size}")
    // (b) pruning proof: candidates ≪ all-pairs (the quantity the
    // permissive gate config cannot demonstrate)
    val allPairs = 2000L * 1999L / 2
    val reduction = allPairs.toDouble / nCand
    info(f"candidates $nCand%d of $allPairs%d all-pairs — reduction ${reduction}%.1f×")
    assert(reduction >= 5.0, f"reduction $reduction%.2f× < 5×")
  }
}
