package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

/** Recall certificates behind the q_ann_lsh / q_cosine_neardup oracles:
  * at the driver's correctness scale (sf0.01) the LSH candidate sets
  * provably contain the exact answers, so the DuckDB oracles can demand
  * full equality with the brute-force result. If a parameter change
  * breaks these, the driver's hash gate breaks with it — fail here first.
  */
class AnnExactRecallSpec extends SparkSpec {
  import spark.implicits._
  private val sf001 = "/root/testdata/sf0.01"

  test("annTopK equals brute-force top-10 exactly at sf0.01") {
    val emb = Tables.embeddings(spark, sf001)
    val brute = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    val ann = SimilarityOps.annTopK(emb, col("vec_id") < 10, 10)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(brute == ann)
  }

  test("ivfTopK at nProbe = nCells equals brute-force top-10 at sf0.01 and sf0.001") {
    // full cell coverage is the provable-containment point (the corpus
    // is near-orthogonal — a pruned probe set cannot contain every
    // exact neighbor; see the q_ann_ivf query comment). Equality here
    // certifies the fit→assign→probe→rank pipeline loses nothing,
    // which is exactly what the q_ann_ivf DuckDB oracle re-proves.
    for (dir <- Seq(sf001, sf0)) {
      val emb = Tables.embeddings(spark, dir)
      val brute = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 10)
        .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
      val ivf = SimilarityOps.ivfTopK(emb, col("vec_id") < 10, 10,
        nCells = 8, nProbe = 8)
        .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(brute == ivf, s"mismatch at $dir")
    }
  }

  test("cosineNearDupsLsh equals brute-force all-pairs at sf0.01 and sf0.001") {
    // sf0.001 is the corpus that caught a miss at 8 tables — keep both
    for (dir <- Seq(sf001, sf0)) {
      val emb = Tables.embeddings(spark, dir)
      val brute = SimilarityOps.cosineNearDups(emb, 0.4)
        .select("va", "vb").as[(Long, Long)].collect().toSet
      val lsh = SimilarityOps.cosineNearDupsLsh(emb, 0.4)
        .select("va", "vb").as[(Long, Long)].collect().toSet
      assert(brute == lsh, s"mismatch at $dir")
    }
  }
}
