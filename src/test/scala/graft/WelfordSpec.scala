package graft

import graft.functions.WelfordAgg
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class WelfordSpec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // scalatest↔scalacheck bridge isn't on the offline classpath; sample
  // generators deterministically instead (seeded — harness forbids RNG).
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("Welford matches the two-pass mean/population-std formula") {
    for (xs <- samples(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)), 100)) {
      val out = WelfordAgg.finish(xs.foldLeft(WelfordAgg.zero)(WelfordAgg.reduce))
      val mean = xs.sum / xs.size
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      assert(out.n == xs.size)
      assert(close(out.mean, mean, 1e-9))
      assert(close(out.std, math.sqrt(variance), 1e-6))
    }
  }

  test("merge is consistent with sequential reduce (combiner contract)") {
    val pairs = samples(Gen.zip(Gen.listOf(Gen.choose(-1e3, 1e3)),
      Gen.listOf(Gen.choose(-1e3, 1e3))), 100)
    for ((a, b) <- pairs if (a ++ b).nonEmpty) {
      val merged = WelfordAgg.merge(
        a.foldLeft(WelfordAgg.zero)(WelfordAgg.reduce),
        b.foldLeft(WelfordAgg.zero)(WelfordAgg.reduce))
      val seq = (a ++ b).foldLeft(WelfordAgg.zero)(WelfordAgg.reduce)
      assert(merged.n == seq.n)
      assert(close(merged.mean, seq.mean, 1e-9))
      assert(close(merged.m2, seq.m2, 1e-6))
    }
  }

  test("distributed udaf equals built-in avg/stddev_pop on real data") {
    val welford = udaf(WelfordAgg)
    val got = Tables.events(spark, sf0)
      .agg(welford($"value").as("w"), avg($"value").as("m"), stddev_pop($"value").as("s"))
      .select($"w.mean", $"w.std", $"m", $"s")
      .as[(Double, Double, Double, Double)].head()
    assert(close(got._1, got._3, 1e-9))
    assert(close(got._2, got._4, 1e-9))
  }
}
