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

  test("pqTopK with shortlist >= corpus equals the exact L2 top-10") {
    // full-shortlist is PQ's provable-containment point (the IVF
    // full-probe trick): ADC order stops mattering and the exact
    // re-rank must reproduce brute force bit-for-bit — certifying the
    // fit→encode→ADC→shortlist→re-rank machinery loses nothing.
    val emb = Tables.embeddings(spark, sf0)
    val n = emb.count().toInt
    val pq = SimilarityOps.pqTopK(emb, col("vec_id") < 10, 10, shortlist = n)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    val d2 = aggregate(zip_with(col("eq"), col("en"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val ex = vecs.select(col("vec_id").as("q_id"), col("e").as("eq"))
      .filter(col("q_id") < 10)
      .crossJoin(vecs.select(col("vec_id").as("nn_id"), col("e").as("en")))
      .filter(col("q_id") =!= col("nn_id"))
      .withColumn("d2", d2)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("d2").asc, col("nn_id").asc)))
      .filter(col("rank") <= 10)
      .select("q_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(pq == ex)
  }
}
