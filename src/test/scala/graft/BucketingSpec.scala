package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private def countShuffles(p: SparkPlan): Int = p match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      countShuffles(q.plan)
    case s: ShuffleExchangeExec => 1 + s.children.map(countShuffles).sum
    case _ => p.children.map(countShuffles).sum
  }

  test("bucketed-bucketed equi-join: ZERO exchanges, answer matches plain join") {
    val l = Tables.lineitem(spark, sf0)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, sf0).select("o_orderkey", "o_orderpriority")
    val bl = graft.sources.Bucketing.writeBucketed(
      l, "graft_spec_bl", "/tmp/graft_spec_bucketed/lineitem", "l_orderkey", 4)
    val bo = graft.sources.Bucketing.writeBucketed(
      o, "graft_spec_bo", "/tmp/graft_spec_bucketed/orders", "o_orderkey", 4)
    // force the sort-merge path (at spec scale AQE would broadcast the
    // orders side and the bucketing claim would go untested)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      joined.queryExecution.toRdd.count()
      // the join itself reads both sides pre-partitioned: the ONLY
      // exchange in the whole plan is the final small groupBy
      val n = countShuffles(joined.queryExecution.executedPlan)
      assert(n == 1,
        s"expected only the agg exchange, got $n:\n" +
          joined.queryExecution.executedPlan.toString.take(2000))
      // same answer as the un-bucketed join
      val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        plain.orderBy("o_orderpriority").collect().toSeq)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("single-bucketed side still saves ITS exchange (other side shuffles)") {
    val bl = spark.table("graft_spec_bl")
    val o = Tables.orders(spark, sf0).select("o_orderkey", "o_orderpriority")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.join(o, bl("l_orderkey") === o("o_orderkey"))
      joined.queryExecution.toRdd.count()
      // one exchange: the un-bucketed orders side repartitioning to the
      // bucket layout (Spark plans the probe side INTO the 4-bucket
      // partitioning rather than shuffling both to shuffle.partitions)
      assert(countShuffles(joined.queryExecution.executedPlan) == 1)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("each bucket is one file (repartition pre-pass keeps sortBy metadata usable)") {
    val dir = new java.io.File("/tmp/graft_spec_bucketed/lineitem")
    val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.length == 4, parts.map(_.getName).mkString(","))
  }
}
