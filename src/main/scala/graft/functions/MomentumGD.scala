package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch momentum gradient descent for linear least squares — the
  * reference's TensorFlow momentum loop (`Assignment 2/Part_2.pdf` p.2
  * Q2: `momentum = γ·momentum + η·grads; β = β − momentum`, γ = 0.9)
  * re-hosted on Spark.
  *
  * The quadratic loss (1/n)·Σ (xᵀβ + b − y)² has gradient
  * (2/n)·(XᵀX·β̃ − Xᵀy) (β̃ = coefficients + intercept against an
  * all-ones column), a function of the FIXED sufficient statistics
  * XᵀX and Xᵀy. So the data is scanned exactly once — a single
  * distributed aggregation of (p+1)(p+2)/2 + (p+1) sums — and every
  * momentum iteration is O(p²) driver flops. A naive
  * one-aggregation-per-iteration loop scans the data `iters` times;
  * at 100 TB that is the difference between one pass and fifty.
  *
  * Sums accumulate in DECIMAL, so the statistics — and therefore the
  * whole trajectory — are independent of partition order: the final β
  * is reproducible to the last bit (see MomentumGDSpec).
  */
object MomentumGD {

  /** Fitted model: coefficients aligned with `features`, then intercept. */
  case class Fit(beta: Array[Double], intercept: Double, iterations: Int)

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(38,18)")).cast("double")

  /** Run `iters` momentum steps from β = 0. `lr` is η, `gamma` the
    * momentum coefficient γ.
    */
  def fit(df: DataFrame, features: Seq[String], target: String,
      iters: Int = 50, lr: Double = 0.05, gamma: Double = 0.9): Fit = {
    val p = features.length
    // design columns: features then the implicit all-ones intercept
    val xs: Seq[Column] = features.map(col) :+ lit(1.0)
    // one distributed pass: upper triangle of XᵀX, Xᵀy, and n
    val gramCols =
      (for { j <- 0 to p; k <- j to p } yield decSum(xs(j) * xs(k)).as(s"g_${j}_$k")) ++
        (0 to p).map(j => decSum(xs(j) * col(target)).as(s"xy_$j")) :+
        count(lit(1)).as("n")
    val row = df.agg(gramCols.head, gramCols.tail: _*).head()
    val gram = Array.ofDim[Double](p + 1, p + 1)
    var idx = 0
    for (j <- 0 to p; k <- j to p) {
      gram(j)(k) = row.getDouble(idx); gram(k)(j) = gram(j)(k); idx += 1
    }
    val xty = Array.tabulate(p + 1)(j => row.getDouble(idx + j))
    val n = row.getLong(idx + p + 1).toDouble
    require(n > 0, "empty input")

    // driver-side momentum loop over the quadratic surface
    val beta = Array.fill(p + 1)(0.0)
    val mom = Array.fill(p + 1)(0.0)
    var it = 0
    while (it < iters) {
      var j = 0
      while (j <= p) {
        var dot = 0.0
        var k = 0
        while (k <= p) { dot += gram(j)(k) * beta(k); k += 1 }
        val g = 2.0 / n * (dot - xty(j))
        mom(j) = gamma * mom(j) + lr * g
        j += 1
      }
      j = 0
      while (j <= p) { beta(j) -= mom(j); j += 1 }
      it += 1
    }
    Fit(beta.take(p), beta(p), iters)
  }
}
