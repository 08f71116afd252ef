package graft

import graft.operators.RegressionOps
import org.apache.spark.sql.functions._

class RegressionOpsSpec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def obs() = RegressionOps.denseWordObservations(
    Tables.documents(spark, sf0), 10,
    lit(1) + pmod(col("n_chars"), lit(5L)),
    (pmod(col("doc_id"), lit(3L)) === 0).cast("int"))

  test("t survival function matches published critical values") {
    // two-sided p at the 0.05 critical value of t(10) is 0.05
    assert(close(RegressionOps.tSf2(2.2281, 10), 0.05, 1e-3))
    assert(close(RegressionOps.tSf2(1.9840, 100), 0.05, 1e-3))
    assert(RegressionOps.tSf2(0.0, 10) == 1.0)
  }

  test("closed-form multivariate OLS matches an explicit Breeze pinv solve") {
    import breeze.linalg.{DenseMatrix, DenseVector, inv, pinv}
    val got = RegressionOps.multiRegression(obs(), Some(10))
      .select("word", "n", "beta1", "beta2", "t1", "p1")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

    val raw = obs().select("word", "x", "y", "c")
      .as[(String, Double, Double, Double)].collect().groupBy(_._1)

    for ((word, rows) <- raw) {
      val n = rows.length
      def zscore(v: Array[Double]): Array[Double] = {
        val m = v.sum / n
        val sd = math.sqrt(v.map(x => (x - m) * (x - m)).sum / (n - 1))
        v.map(x => (x - m) / sd)
      }
      val zx = zscore(rows.map(_._2))
      val zy = zscore(rows.map(_._3))
      val zc = zscore(rows.map(_._4))
      val design = DenseMatrix.horzcat(
        DenseMatrix.ones[Double](n, 1),
        new DenseMatrix(n, 1, zx),
        new DenseMatrix(n, 1, zc))
      val yv = DenseVector(zy)
      val b = pinv(design) * yv
      val resid = yv - design * b
      val sigma2 = (resid dot resid) / (n - 3)
      val covb = inv(design.t * design) * sigma2
      val t1 = b(1) / math.sqrt(covb(1, 1))
      val (_, gn, gb1, gb2, gt1, gp1) = got(word)
      assert(gn == n)
      assert(close(gb1, b(1), 1e-6), s"$word beta1 ${gb1} vs ${b(1)}")
      assert(close(gb2, b(2), 1e-6), s"$word beta2 ${gb2} vs ${b(2)}")
      assert(close(gt1, t1, 1e-6), s"$word t1 ${gt1} vs ${t1}")
      assert(close(gp1, RegressionOps.tSf2(t1, n - 3), 1e-6))
    }
  }

  test("simple regression beta equals Pearson r and t matches the standard formula") {
    val got = RegressionOps.simpleRegression(obs(), Some(10))
      .select("word", "n", "beta", "t").as[(String, Long, Double, Double)].collect()
    for ((_, n, beta, t) <- got) {
      assert(beta.abs <= 1.0)
      assert(close(t, beta * math.sqrt((n - 2) / (1 - beta * beta)), 1e-9))
    }
    assert(got.length == 10)
  }

  test("dense observations: every (top word, doc) pair present, zeros included") {
    val o = obs()
    val nDocs = Tables.documents(spark, sf0).count()
    assert(o.count() == nDocs * 10)
    assert(o.filter($"x" === 0.0).count() > 0)  // zero-frequency rows exist
  }
}
