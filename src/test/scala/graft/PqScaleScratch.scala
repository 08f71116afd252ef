package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test-scope, not shipped): split q_ann_pq's sf1 cost between
  * the PQ product path (fit+encode+ADC+re-rank) and the exact-verifier
  * certificate harness.
  */
object PqScaleScratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/scaledata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    println(s"corpus: ${emb.count()}")
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val n1 = graft.operators.SimilarityOps.pqTopK(emb, col("vec_id") < 10, 10).count()
      println(f"rep $rep pqTopK only: $n1 rows ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val n2 = graft.operators.SimilarityOps.pqRecallCertificate(
        emb, col("vec_id") < 10, 10, minRecall = 0.5).count()
      println(f"rep $rep certificate: $n2 rows ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
