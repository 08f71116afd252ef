package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Scratch recall probe for the PQ path (builder tooling, test scope). */
object PqScratch {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val configs = Seq((16, 2, 500), (16, 2, 1000), (32, 3, 1000))
    dirs.foreach { dir =>
      val emb = Tables.embeddings(spark, dir)
      // exact side once per dir
      configs.foreach { case (kk, its, sl) =>
      val t0 = System.nanoTime()
      val pq = SimilarityOps.pqTopK(emb, col("vec_id") < 10, 10,
          codebookK = kk, iters = its, shortlist = sl)
        .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t1 = System.nanoTime()
      // exact L2 top-10 by brute force
      val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
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
        .select("q_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hits = pq.intersect(ex).size
      val perQ = ex.groupBy(_._1).map { case (q, s) =>
        q -> s.intersect(pq).size }.toSeq.sortBy(_._1)
      println(s"$dir K=$kk iters=$its sl=$sl: recall ${hits}/${ex.size} = " +
        s"${hits.toDouble / ex.size} t=${(t1 - t0) / 1e9} minQ=${perQ.map(_._2).min}")
      }
    }
    spark.stop()
  }
}
