package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Online mean/variance state: (n, mean, M2). */
case class WelfordBuf(n: Long, mean: Double, m2: Double)

/** Final statistics (population std-dev, matching the reference's ÷n). */
case class WelfordStats(n: Long, mean: Double, std: Double)

/** Single-pass mean/population-std-dev — the reference's streaming
  * Welford recurrence (sampler_v02.py:50-56,81-87) as a distributed
  * `Aggregator`. `reduce` is the per-element recurrence verbatim;
  * `merge` is Chan's parallel combination, which is exactly the
  * map-side-combine contract the reference's MR combiner demands
  * (commutative + associative — MRSystemSimulator2020.py:75-93).
  *
  * Spark's built-in `stddev_pop` has the same numerics; this exists to
  * demonstrate the reference's one-pass constraint as a first-class
  * UDAF (usable in Structured Streaming update mode) and to pin the
  * algorithm in tests. Register with `functions.udaf(WelfordAgg)`.
  */
object WelfordAgg extends Aggregator[Double, WelfordBuf, WelfordStats] {
  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val delta = x - b.mean
    val mean = b.mean + delta / n
    WelfordBuf(n, mean, b.m2 + delta * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      WelfordBuf(n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n)
    }
  }

  override def finish(b: WelfordBuf): WelfordStats =
    if (b.n == 0) WelfordStats(0L, Double.NaN, Double.NaN)
    else WelfordStats(b.n, b.mean, math.sqrt(b.m2 / b.n))

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[WelfordStats] = Encoders.product[WelfordStats]
}
