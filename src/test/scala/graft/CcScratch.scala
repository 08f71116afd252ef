package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch (test-scope, not shipped): time nearDupClusters variants on
  * the sf0.1 near-dup graph and report round counts.
  */
object CcScratch {

  def variant(pairs: DataFrame, jump: Boolean, maxIter: Int = 30): (Long, Int, Double) = {
    val t0 = System.nanoTime()
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var prevSum = labels.agg(sum("label")).head().getLong(0)
    var converged = false
    var i = 0
    var rows = 0L
    while (!converged && i < maxIter) {
      val prop = edges.join(labels, edges("dst") === labels("node"))
        .select(edges("src").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min("label").as("label"))
      val next = (if (!jump) prop
        else prop
          .join(prop.select(col("node").as("__ln"), col("label").as("__ll")),
            col("label") === col("__ln"))
          .select(col("node"), col("__ll").as("label"))).persist()
      val nextSum = next.agg(sum("label")).head().getLong(0)
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    rows = labels.count()
    labels.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    (rows, i, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val pairs = graft.operators.DedupOps.verifiedNearDups(docs).persist()
    println(s"pairs: ${pairs.count()}")
    for (rep <- 1 to 3; jump <- Seq(false, true)) {
      val (n, rounds, secs) = variant(pairs, jump)
      println(f"rep $rep jump=$jump: rows $n rounds $rounds in $secs%.2f s")
    }
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.operators.DedupOps.nearDupClusters(pairs).count()
      spark.catalog.clearCache()
      println(f"rep $rep shipped: rows $n in ${(System.nanoTime()-t0)/1e9}%.2f s")
      val _ = pairs.persist(); pairs.count()
    }
    spark.stop()
  }
}
