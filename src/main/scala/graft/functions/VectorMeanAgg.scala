package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial-aggregation buffer: element count + exact per-dimension
  * decimal sums.
  */
case class VecMeanBuf(n: Long, sums: Seq[BigDecimal])

/** Element-wise mean of a vector column (class centroids over an
  * embedding table) as a typed `Aggregator` UDAF.
  *
  * Why an Aggregator and not `posexplode → groupBy(label, pos) → sum`:
  * the explode form amplifies a 100 TB embedding table dim× (64× here)
  * BEFORE its shuffle, and its exchange key space is labels×dims. This
  * aggregator ships ONE (n, sums) buffer per label per partition across
  * a single label-keyed exchange — the map-side-combine shape of every
  * other agg in the library — with zero row amplification. The
  * posexplode form survives as the spec's independent oracle.
  *
  * Numerics: inputs arrive as DECIMAL (callers cast float → double →
  * decimal(28,12) IN THE PLAN, so the lossy binary→decimal step uses
  * Spark's own cast — the engine↔oracle-proven conversion — never a
  * JVM-side reimplementation). Decimal addition is exact and
  * order-insensitive, so partial/merge scheduling cannot perturb the
  * result; the single double division happens in `finish`, mirroring
  * the `sum(decimal).cast(double) / count` idiom the oracles use.
  */
object VectorMeanAgg extends Aggregator[Seq[BigDecimal], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(0L, Seq.empty)

  private def add(a: Seq[BigDecimal], b: Seq[BigDecimal]): Seq[BigDecimal] = {
    require(a.length == b.length,
      s"vector length mismatch: ${a.length} vs ${b.length}")
    a.lazyZip(b).map(_ + _)
  }

  override def reduce(b: VecMeanBuf, v: Seq[BigDecimal]): VecMeanBuf =
    if (v == null) b
    else if (b.n == 0L) VecMeanBuf(1L, v)
    else VecMeanBuf(b.n + 1, add(b.sums, v))

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else VecMeanBuf(a.n + b.n, add(a.sums, b.sums))

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sums.map(_.toDouble / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column-API entry: `groupBy(...).agg(VectorMeanAgg.vectorMean($"v"))`
    * where `v` is `array<decimal>`.
    */
  def vectorMean(c: Column): Column =
    udaf(this, ExpressionEncoder[Seq[BigDecimal]]()).apply(c)
}
