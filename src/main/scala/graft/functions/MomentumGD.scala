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

  /** [[fit]] on z-scored features AND target, without a separate
    * standardization pass: the standardized gram/moment matrix derives
    * algebraically from the raw one —
    * Σ z_j·z_k = (S_jk − n·m_j·m_k)/(s_j·s_k) — so the data is scanned
    * exactly ONCE even though the optimization runs in standardized
    * space (well-conditioned, one learning rate fits all columns).
    * The intercept is exactly 0 in standardized space and is reported
    * as such.
    */
  def fitStandardized(df: DataFrame, features: Seq[String], target: String,
      iters: Int = 50, lr: Double = 0.05, gamma: Double = 0.9): Fit = {
    val p = features.length
    val xs: Seq[Column] = (features :+ target).map(col)
    val d = p + 1 // target rides along as column index p
    val cols =
      (for { j <- 0 until d; k <- j until d } yield decSum(xs(j) * xs(k)).as(s"s_${j}_$k")) ++
        (0 until d).map(j => decSum(xs(j)).as(s"m_$j")) :+
        count(lit(1)).as("n")
    val row = df.agg(cols.head, cols.tail: _*).head()
    val s = Array.ofDim[Double](d, d)
    var idx = 0
    for (j <- 0 until d; k <- j until d) {
      s(j)(k) = row.getDouble(idx); s(k)(j) = s(j)(k); idx += 1
    }
    val mean = Array.tabulate(d)(j => row.getDouble(idx + j))
    val n = row.getLong(idx + d).toDouble
    require(n > 0, "empty input")
    for (j <- 0 until d) mean(j) /= n
    val sd = Array.tabulate(d)(j => math.sqrt(s(j)(j) / n - mean(j) * mean(j)))
    // standardized moments: gram over z-features, xty against z-target
    val gram = Array.ofDim[Double](p + 1, p + 1)
    val xty = Array.ofDim[Double](p + 1)
    for (j <- 0 until p; k <- 0 until p)
      gram(j)(k) = (s(j)(k) - n * mean(j) * mean(k)) / (sd(j) * sd(k))
    // intercept column in standardized space: Σ z_j = 0, Σ 1 = n
    for (j <- 0 until p) { gram(j)(p) = 0.0; gram(p)(j) = 0.0 }
    gram(p)(p) = n
    for (j <- 0 until p)
      xty(j) = (s(j)(p) - n * mean(j) * mean(p)) / (sd(j) * sd(p))
    xty(p) = 0.0
    val beta = descend(gram, xty, n, p, iters, lr, gamma)
    Fit(beta.take(p), beta(p), iters)
  }

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
    val beta = descend(gram, xty, n, p, iters, lr, gamma)
    Fit(beta.take(p), beta(p), iters)
  }

  /** Driver-side momentum loop over the quadratic surface defined by
    * (XᵀX, Xᵀy): O(p²) per iteration, no data access.
    */
  private def descend(gram: Array[Array[Double]], xty: Array[Double],
      n: Double, p: Int, iters: Int, lr: Double, gamma: Double): Array[Double] = {
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
    beta
  }
}
