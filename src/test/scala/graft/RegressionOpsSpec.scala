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

  test("logisticGd learns a separable boundary: accuracy 1.0, signed betas") {
    // x1 separates the classes with a wide margin (y=1 ⟺ x1 ≥ 0.8);
    // x2 is constant (no signal). Enough rounds at a healthy rate must
    // find the boundary: training accuracy 1.0, β1 strongly positive,
    // and β2 ≈ scaled intercept movement only.
    val feats = (0 until 200).map { i =>
      val y = if (i % 2 == 0) 1.0 else 0.0
      val x1 = if (y == 1.0) 0.8 + (i % 7) * 0.02 else 0.1 + (i % 7) * 0.02
      (x1, 0.5, y)
    }.toDF("x1", "x2", "y")
    val got = RegressionOps.logisticGd(feats, iters = 200, lr = 2.0)
      .as[(String, Double)].collect().toMap
    assert(got("accuracy") == 1.0)
    assert(got("n_correct") == 200.0 && got("n_docs") == 200.0)
    assert(got("b1") > 1.0) // the separating feature carries the weight
  }

  test("logisticGd trajectory: one hand-checked round from zero") {
    // From β=0, σ=0.5 exactly for every row, so the first-round
    // gradient is ((0.5−y), (0.5−y)·x1, (0.5−y)·x2) averaged; with
    // lr=0.5: β_j = round(−0.5·mean_j, 9).
    val feats = Seq((1.0, 2.0, 1.0), (3.0, 4.0, 0.0)).toDF("x1", "x2", "y")
    val got = RegressionOps.logisticGd(feats, iters = 1, lr = 0.5)
      .as[(String, Double)].collect().toMap
    def r9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // s0 = (0.5−1)+(0.5−0) = 0; s1 = −0.5·1+0.5·3 = 1; s2 = −0.5·2+0.5·4 = 1
    assert(got("b0") == r9(-0.5 * (0.0 / 2)))
    assert(got("b1") == r9(-0.5 * (1.0 / 2)))
    assert(got("b2") == r9(-0.5 * (1.0 / 2)))
  }

  test("giniStump: perfectly separable split ranks 1 with score 0") {
    // x<=2 all positive, x>=3 all negative -> split at 2 is pure
    val df = Seq((1L, true), (2L, true), (2L, true),
      (3L, false), (4L, false), (4L, false)).toDF("x", "y")
    val got = RegressionOps.giniStump(df, col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // x=4 leaves empty right child
    val best = got(2L)
    assert(best._7 == 1 && best._6 == 0.0)
    assert(best == ((2L, 3L, 3L, 3L, 0L, 0.0, 1)))
    // split at 1: left pure (1 pos), right mixed 2/5 ->
    //   score = 0 + 2*3/5 = 1.2
    assert(got(1L)._6 == 1.2 && got(1L)._7 > 1)
    // split at 3: left 3 pos + 1 neg -> 3*1/4; right pure
    assert(got(3L)._6 == 0.75)
  }
}
