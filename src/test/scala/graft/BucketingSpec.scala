package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The 100 TB co-location story (README "Scale design"): two tables
  * bucketed on the join key join WITHOUT any shuffle exchange — what a
  * real lake would do for the ratings⋈ratings / orders⋈lineitem joins
  * instead of exchanging both sides every query.
  */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // force AQE to finalize
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => Seq.empty
      }
      Seq(p) ++ (p.children ++ p.subqueries).flatMap(walk) ++ nested
    }
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val base = "/tmp/graft_buckets"
    val r = Tables.events(spark, sf0)
      .select(col("user_id"), col("event_type"), col("value"))
    spark.sql("DROP TABLE IF EXISTS g_bucket_a")
    spark.sql("DROP TABLE IF EXISTS g_bucket_b")
    r.write.format("parquet").bucketBy(4, "user_id")
      .option("path", s"$base/a").mode("overwrite").saveAsTable("g_bucket_a")
    r.groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.format("parquet").bucketBy(4, "user_id")
      .option("path", s"$base/b").mode("overwrite").saveAsTable("g_bucket_b")

    val joined = spark.table("g_bucket_a").join(spark.table("g_bucket_b"), "user_id")
    assert(shuffleCount(joined) == 0,
      "bucketed join must not exchange either side")

    // same join on the raw (unbucketed) frames shuffles at least once
    val unbucketed = r.join(r.groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
    assert(shuffleCount(unbucketed) >= 1)

    // and a bucketed-key aggregation needs no exchange either
    val agg = spark.table("g_bucket_a").groupBy("user_id")
      .agg(sum(col("value")).as("s"))
    assert(shuffleCount(agg) == 0, "bucketed groupBy must be exchange-free")
  }
}
