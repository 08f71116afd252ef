package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness (not shipped): decomposes q_simhash_pairs'
  * cost at a given SF — block-bucket skew, candidate count, output
  * pairs. Usage: Test/runMain graft.SimhashScaleScratch <sfDir>
  */
object SimhashScaleScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val docs = graft.Tables.documents(spark, args(0))
    val sigs = graft.operators.DedupOps.simhash(docs)
    val banded = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("bval", expr("shiftright(sig, cast(blk * 15 as int)) & 32767L"))
    banded.groupBy("blk", "bval").count().orderBy(desc("count")).limit(5)
      .collect()
      .foreach(r => println(s"hot blk=${r.get(0)} bval=${r.get(1)} n=${r.get(2)}"))
    val cand = banded.as("a").join(banded.as("b"),
      col("a.blk") === col("b.blk") && col("a.bval") === col("b.bval") &&
        col("a.doc_id") < col("b.doc_id")).count()
    val out = graft.operators.DedupOps.simhashPairs(docs).count()
    println(s"candidates=$cand pairs=$out " +
      s"distinctSigs=${sigs.select("sig").distinct().count()} docs=${docs.count()}")
    spark.stop()
  }
}
