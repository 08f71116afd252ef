package graft

import breeze.linalg.{pinv, DenseMatrix, DenseVector}
import graft.functions.MomentumGD
import org.apache.spark.sql.functions._

class MomentumGDSpec extends SparkSpec {
  import spark.implicits._

  test("momentum GD converges to the OLS solution on standardized data") {
    // deterministic synthetic data: y = 2·x1 − 1·x2 + 0.5 + small structured noise
    val rows = (0 until 400).map { i =>
      val x1 = (i % 20 - 10) / 10.0
      val x2 = ((i * 7) % 13 - 6) / 6.0
      val noise = ((i * 31) % 11 - 5) / 500.0
      (x1, x2, 2.0 * x1 - 1.0 * x2 + 0.5 + noise)
    }
    val df = rows.toDF("x1", "x2", "y")
    val fit = MomentumGD.fit(df, Seq("x1", "x2"), "y",
      iters = 200, lr = 0.05, gamma = 0.9)

    // Breeze closed form on the same data
    val x = DenseMatrix(rows.map(r => Array(r._1, r._2, 1.0)): _*)
    val yv = DenseVector(rows.map(_._3).toArray)
    val beta = pinv(x.t * x) * (x.t * yv)
    assert(math.abs(fit.beta(0) - beta(0)) < 1e-4)
    assert(math.abs(fit.beta(1) - beta(1)) < 1e-4)
    assert(math.abs(fit.intercept - beta(2)) < 1e-4)
  }

  test("fitStandardized (one pass) equals explicit standardize-then-fit") {
    val rows = (0 until 500).map { i =>
      val x1 = 100.0 + (i % 23)          // deliberately badly scaled
      val x2 = 0.001 * ((i * 11) % 17)
      (x1, x2, 5.0 * x1 - 2000.0 * x2 + 3.0 + ((i * 13) % 9 - 4) / 50.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val onePass = MomentumGD.fitStandardized(df, Seq("x1", "x2"), "y", iters = 300)
    // explicit two-pass standardization + plain fit
    val st = df.agg(avg("x1"), stddev_pop("x1"), avg("x2"), stddev_pop("x2"),
      avg("y"), stddev_pop("y")).head()
    val z = df.select(
      ((col("x1") - st.getDouble(0)) / st.getDouble(1)).as("x1"),
      ((col("x2") - st.getDouble(2)) / st.getDouble(3)).as("x2"),
      ((col("y") - st.getDouble(4)) / st.getDouble(5)).as("y"))
    val twoPass = MomentumGD.fit(z, Seq("x1", "x2"), "y", iters = 300)
    assert(math.abs(onePass.beta(0) - twoPass.beta(0)) < 1e-9)
    assert(math.abs(onePass.beta(1) - twoPass.beta(1)) < 1e-9)
    assert(math.abs(onePass.intercept) < 1e-9) // exactly 0 in standardized space
    assert(math.abs(twoPass.intercept) < 1e-6)
  }

  test("trajectory is deterministic across repartitionings (decimal gradient sums)") {
    val df = (0 until 300).map { i =>
      val x = (i % 17 - 8) / 8.0
      (x, 3.0 * x - 0.25 + ((i * 13) % 7 - 3) / 100.0)
    }.toDF("x", "y")
    val a = MomentumGD.fit(df.repartition(1), Seq("x"), "y", iters = 40)
    val b = MomentumGD.fit(df.repartition(7, col("y")), Seq("x"), "y", iters = 40)
    assert(a.beta(0) == b.beta(0)) // bit-identical, not just close
    assert(a.intercept == b.intercept)
  }
}
