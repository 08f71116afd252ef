package graft

import graft.functions.VectorMeanAgg
import org.apache.spark.sql.functions._

class VectorMeanAggSpec extends SparkSpec {
  import spark.implicits._

  private def decVec(c: String) =
    expr(s"transform($c, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))")

  test("vectorMean equals the posexplode formulation on real embeddings") {
    val emb = Tables.embeddings(spark, sf0)
    val viaAgg = emb.select(col("label"), decVec("embedding").as("v"))
      .groupBy("label").agg(VectorMeanAgg.vectorMean(col("v")).as("c"))
      .select(col("label"), posexplode(col("c")))
      .select(col("label"), col("pos").as("d"), round(col("col"), 9).as("m"))
      .as[(Int, Int, Double)].collect().toSet
    // independent formulation: 64x explode, decimal sum per (label, dim)
    val viaExplode = emb.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg((sum(col("col").cast("double").cast("decimal(28,12)")).cast("double")
        / count(lit(1))).as("m"))
      .select(col("label"), col("pos").as("d"), round(col("m"), 9).as("m"))
      .as[(Int, Int, Double)].collect().toSet
    assert(viaAgg == viaExplode)
    assert(viaAgg.nonEmpty)
  }

  test("decimal sums are order-insensitive: shuffled input, same bits") {
    val emb = Tables.embeddings(spark, sf0)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("label"), decVec("embedding").as("v"))
        .groupBy("label").agg(VectorMeanAgg.vectorMean(col("v")).as("c"))
        .select(col("label"), col("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val a = run(emb.repartition(3))
    val b = run(emb.repartition(17, col("vec_id")).sortWithinPartitions(col("vec_id").desc))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v == b(k), s"label $k diverged") }
  }

  test("ragged vectors are rejected, empty groups give empty means") {
    val bad = Seq((1, Seq(1.0f, 2.0f)), (1, Seq(1.0f))).toDF("label", "embedding")
    val ex = intercept[Exception] {
      bad.select(col("label"), decVec("embedding").as("v"))
        .groupBy("label").agg(VectorMeanAgg.vectorMean(col("v")).as("c"))
        .collect()
    }
    assert(ex.getMessage != null)
    assert(VectorMeanAgg.finish(VectorMeanAgg.zero).isEmpty)
  }
}
