package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder measurement harness (not shipped): q_ann_pq recall at sf1 as
  * a function of shortlist size — diagnosing the round-7 sf1 audit's
  * pq_ok=false rows. Usage: PqSf1Scratch <sfDir> <shortlist>...
  */
object PqSf1Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, args(0))
    args.drop(1).map(_.toInt).foreach { sl =>
      val ex = SimilarityOps.pqRecallCertificate(emb, col("vec_id") < 10, 10,
        0.5, shortlist = sl)
      println(s"== shortlist=$sl ==")
      ex.orderBy("q_id").collect().foreach(r => println(s"  cert: $r"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
