package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (test-scope, not shipped): time bloomContaminatedPairs
  * uncapped vs evalDfCap on the scaling corpus, plus the shingle-space
  * saturation stats behind the SCALE.md diagnosis.
  */
object BloomScratch {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/scaledata/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
    val eval = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
    // saturation stats: distinct shingles vs postings
    val sh = eval.select(explode(split(lower(col("text")), "\\s+")).as("w"))
    println(s"eval docs: ${eval.count()}")
    for ((cap, name) <- Seq(0L -> "uncapped", 64L -> "cap=64")) {
      for (rep <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.DedupOps.bloomContaminatedPairs(
          train, eval, minFrac = 0.25, evalDfCap = cap).count()
        println(f"$name rep $rep: $n pairs in ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
