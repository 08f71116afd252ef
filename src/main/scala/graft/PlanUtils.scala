package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan-shaping helpers shared across operators. */
object PlanUtils {

  /** Skew-safe equi-join of a big, possibly skewed fact side against a
    * smaller dimension side: every big row gets a deterministic salt in
    * [0, salts) derived from hashing `saltFrom` (any column that varies
    * within a hot key — a row id, a payload column); the dim side is
    * replicated `salts`× via explode. The shuffle then keys on
    * (key, salt), splitting each hot key across `salts` reducers.
    *
    * Use when ONE key owns a large fraction of the rows and AQE's
    * skew-join splitting can't help (e.g. the skew emerges after other
    * operators, or the build side must shuffle too). Costs a `salts`×
    * dim replication — keep the dim side narrow. Row-identical to the
    * plain inner equi-join.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, salts: Int): DataFrame = {
    val b = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Ensure CPU-heavy per-row work downstream runs with at least the
    * session's default parallelism. A plain `repartition` is NOT
    * enough: Catalyst pushes deterministic projects/filters (and the
    * partial side of aggregations) below the exchange, so the work
    * lands back in the scan stage — which on a single-row-group
    * parquet file is ONE task (measured: whole pipelines serialized on
    * one core). The DataFrame→RDD→DataFrame round-trip is an optimizer
    * barrier that pins the exchange below the compute. No-op (no
    * shuffle at all) when the scan already has enough splits — i.e. on
    * any real multi-file lake; only the local single-file case pays
    * the (tiny, pre-pruned) shuffle.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else spark.createDataFrame(df.repartition(target).rdd, df.schema)
  }

  /** Z-order (Morton) value of two non-negative integer columns:
    * interleaves the low `bits` bits of each (`a` on even positions,
    * `b` on odd) — the multi-dimensional data-layout curve behind
    * lakehouse OPTIMIZE ZORDER. Rows sorted/partitioned by z-value
    * cluster BOTH dimensions at once: any aligned z-range maps to a
    * bounded rectangle in (a, b), so min/max column stats prune scans
    * on either predicate — the property a single-column sort cannot
    * give. Pure integer bit arithmetic (codegen-friendly, exactly
    * mirrorable in ANSI SQL); callers range-partition or sort by the
    * result before writing.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { d =>
      shiftleft(shiftright(a, d).bitwiseAND(lit(1L)), 2 * d) +
        shiftleft(shiftright(b, d).bitwiseAND(lit(1L)), 2 * d + 1)
    }.reduce(_ + _)
  }

  /** Half-up 4-dp mean of a nonnegative CENT-grid sum: published value
    * = floor((2·100·centsSum + n) / (2n)) / 10⁴ — pure integer
    * arithmetic, so the boundary x.xxxx5 rationals that make
    * round(double, 4) diverge between engines (Spark rounds the binary
    * expansion, DuckDB the shortest decimal repr) are decided by exact
    * comparison instead. The quotient runs via the pmod-reduced
    * decimal(38,0) division (exactly divisible by construction — the
    * decimal scale rules can't round it); int64 bound: 200·Σcents ≤
    * 7e17 at a 10¹²-row corpus. DuckDB rendering: hugeint `//`.
    */
  def halfUpMean4(centsSum: Column, n: Column): Column =
    ratioRound(centsSum, n * lit(100L), 4)

  /** BigInt twin of [[ratioRound]]'s half-up core for bounded
    * driver-side iterations (stationary distribution, raking) — ONE
    * definition so the engine loops and the oracle floor-division
    * replays can never drift apart. Contract: den > 0, num >= 0.
    */
  def halfUpBig(num: BigInt, den: BigInt): BigInt = (2 * num + den) / (2 * den)

  /** Half-up (away-from-zero) rounding of the EXACT rational num/den
    * at `s` decimal places, in pure integer arithmetic — the
    * engine-portable replacement for `round(num/den as double, s)`
    * wherever the ratio is an exact rational: such ratios land exactly
    * ON x.…5 rounding boundaries (data-dependent denominators make
    * this a certainty at scale), where rounding the inexact DOUBLE
    * diverges between engines (Spark rounds the binary expansion,
    * DuckDB the shortest decimal repr — the sf10 audit's
    * q_semi_sample/q_naive_bayes findings). Here the boundary is
    * decided by exact comparison instead:
    *   |q| = floor((2·|num|·10^s + den) / (2·den)),  sign re-applied.
    *
    * Contract: `num` integer-valued (counts, or pre-scaled exact
    * decimals), `den` integer-valued and POSITIVE, |num/den|·10^s
    * < 2^53. The quotient runs in decimal(38,0) lanes via the
    * pmod-reduced exact division (decimal scale rules can't round an
    * exact quotient); DuckDB rendering: hugeint `//` (EntryHelpers
    * .ratioRoundSql). Published value = q/10^s, an exact double.
    */
  def ratioRound(num: Column, den: Column, s: Int): Column = {
    require(s >= 0 && s <= 9, "scale must be in [0, 9]")
    val dec0 = "decimal(38,0)"
    val p = math.pow(10, s).toLong
    val a = abs(num.cast(dec0) * lit(p)) * lit(2L) + den.cast(dec0)
    val b = den.cast(dec0) * lit(2L)
    val q = ((a - pmod(a, b)) / b).cast("long")
    (when(num < 0, -q).otherwise(q)).cast("double") / lit(p.toDouble)
  }
}
