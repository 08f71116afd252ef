package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Properties behind the seeded samplers' oracle story: the sample is a
  * pure function of (key, seed) — independent of partitioning, task
  * order, or engine — and statistically uniform.
  */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  test("uniformSampleExact returns exactly k rows, stable across partitionings") {
    val ev = Tables.events(spark, sf0)
    val a = RelationalOps.uniformSampleExact(ev, col("event_id"), 200, "s1")
      .select("event_id").as[Long].collect().toSet
    assert(a.size == 200)
    val b = RelationalOps.uniformSampleExact(ev.repartition(7), col("event_id"), 200, "s1")
      .select("event_id").as[Long].collect().toSet
    val c = RelationalOps.uniformSampleExact(ev.coalesce(1), col("event_id"), 200, "s1")
      .select("event_id").as[Long].collect().toSet
    assert(a == b && a == c)
  }

  test("different seeds draw (almost entirely) different samples") {
    val ev = Tables.events(spark, sf0)
    val n = ev.count()
    val a = RelationalOps.uniformSampleExact(ev, col("event_id"), 200, "s1")
      .select("event_id").as[Long].collect().toSet
    val d = RelationalOps.uniformSampleExact(ev, col("event_id"), 200, "s2")
      .select("event_id").as[Long].collect().toSet
    // expected overlap is hypergeometric: 200·(200/n); allow 5× slack
    val expected = 200.0 * 200.0 / n
    assert((a & d).size <= math.max(5 * expected, 20))
  }

  test("uniformSampleFraction hits the target rate within binomial noise") {
    val ev = Tables.events(spark, sf0)
    val n = ev.count().toDouble
    for (f <- Seq(0.01, 0.1, 0.5)) {
      val k = RelationalOps.uniformSampleFraction(ev, col("event_id"), f, "s1").count()
      val sd = math.sqrt(n * f * (1 - f))
      assert(math.abs(k - n * f) <= 5 * sd, s"f=$f k=$k expected ${n * f} ± ${5 * sd}")
    }
  }

  test("stratifiedSampleExact yields exactly k per group, stable across partitionings") {
    val ev = Tables.events(spark, sf0).select("event_id", "event_type")
    val a = RelationalOps.stratifiedSampleExact(ev, Seq("event_type"), col("event_id"), 20, "s1")
    val counts = a.groupBy("event_type").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 20))
    val setA = a.select("event_id").as[Long].collect().toSet
    val setB = RelationalOps.stratifiedSampleExact(ev.repartition(7),
      Seq("event_type"), col("event_id"), 20, "s1")
      .select("event_id").as[Long].collect().toSet
    assert(setA == setB)
  }

  test("trainingOrder: dense per-shard positions, epoch independence, partition stability") {
    val docs = Tables.documents(spark, sf0).select("doc_id")
    val t1 = RelationalOps.trainingOrder(docs, col("doc_id"), "ep1", 8)
    // positions are dense 0..n_s-1 within every shard
    val byShard = t1.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos_in_shard").as("mx"), min("pos_in_shard").as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(byShard.nonEmpty && byShard.forall { case (_, n, mx, mn) => mn == 0L && mx == n - 1 })
    // global_pos is injective (round-robin interleave never collides)
    assert(t1.select("global_pos").distinct().count() == docs.count())
    // a different epoch seed yields a genuinely different permutation
    val o1 = t1.orderBy("shard", "pos_in_shard").select("doc_id").as[Long].collect().toSeq
    val o2 = RelationalOps.trainingOrder(docs, col("doc_id"), "ep2", 8)
      .orderBy("shard", "pos_in_shard").select("doc_id").as[Long].collect().toSeq
    assert(o1 != o2 && o1.toSet == o2.toSet)
    // deterministic under repartitioning
    val r = RelationalOps.trainingOrder(docs.repartition(13), col("doc_id"), "ep1", 8)
      .orderBy("shard", "pos_in_shard").select("doc_id").as[Long].collect().toSeq
    assert(r == o1)
  }

  test("hashUniform draws are uniform across deciles (chi-square sanity)") {
    val ev = Tables.events(spark, sf0)
    val n = ev.count().toDouble
    val counts = ev.select(floor(RelationalOps.hashUniform(col("event_id"), "s1") * 10).as("d"))
      .groupBy("d").count().orderBy("d").as[(Long, Long)].collect()
    assert(counts.length == 10)
    val expected = n / 10
    val chi2 = counts.map { case (_, c) => (c - expected) * (c - expected) / expected }.sum
    // df = 9; P(chi2 > 27.9) ≈ 0.001 — deterministic hash, fixed number
    assert(chi2 < 27.9, s"chi2 $chi2")
  }
}
