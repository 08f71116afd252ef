package graft

import graft.plans.TopKOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sf0)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("user_id", "event_id", "value")
  }

  test("topKPerKey equals the window row_number formulation on real data") {
    val expected = windowTopK(3).as[(Long, Long, Double)].collect().toSet
    val got = TopKOps.topKPerKey(
      Tables.events(spark, sf0).select("user_id", "event_id", "value"),
      Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("physical plan uses the bounded-heap operator, partial then final, no sort") {
    val df = TopKOps.topKPerKey(
      Tables.events(spark, sf0).select("user_id", "event_id", "value"),
      Seq("user_id"), Seq(col("value").desc, col("event_id").asc), 3)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("+- Sort"))
    // partial + final = two operator instances around one exchange
    // (the node renders without the Exec suffix)
    assert("TopKPerKey ".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("null order values rank exactly as the window form (NULLS LAST under desc)") {
    val df = Seq((1L, 10L, Some(5.0)), (1L, 11L, None), (1L, 12L, Some(1.0)))
      .toDF("user_id", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("event_id").as[Long].collect().toSet
    val viaTopK = TopKOps.topKPerKey(df, Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc), 2)
      .select("event_id").as[Long].collect().toSet
    assert(viaTopK == viaWindow)
    assert(viaTopK == Set(10L, 12L)) // null sorts last under desc, excluded at k=2
  }

  test("keys with fewer than k rows pass through whole; k=1 picks the max") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("user_id", "event_id", "value")
    val top1 = TopKOps.topKPerKey(df, Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc), 1)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(top1 == Set((1L, 11L), (2L, 20L)))
    val top5 = TopKOps.topKPerKey(df, Seq("user_id"),
      Seq(col("value").desc, col("event_id").asc), 5)
    assert(top5.count() == 3)
  }
}
