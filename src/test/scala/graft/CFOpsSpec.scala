package graft

import graft.operators.{CFOps, Ratings}
import org.apache.spark.sql.functions._

class CFOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkRatings(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "item_id", "rating")

  test("cosine similarity on a hand-computed example") {
    // items 1,2 rated by users 1..3; identical centered vectors -> sim 1
    val r = mkRatings(
      (1L, 1L, 5L), (2L, 1L, 3L), (3L, 1L, 1L),
      (1L, 2L, 4L), (2L, 2L, 2L), (3L, 2L, 0L))
    val p = CFOps.Params(minUsersPerItem = 1, minItemsPerUser = 1)
    val sims = CFOps.itemSimilarities(CFOps.meanCentered(r), Seq(1L), p)
      .select("item_id", "sim").as[(Long, Double)].collect().toMap
    assert(math.abs(sims(2L) - 1.0) < 1e-12)
  }

  test("anti-correlated item is filtered by sim > 0") {
    val r = mkRatings(
      (1L, 1L, 5L), (2L, 1L, 1L),
      (1L, 2L, 1L), (2L, 2L, 5L))
    val p = CFOps.Params(minUsersPerItem = 1, minItemsPerUser = 1)
    val sims = CFOps.itemSimilarities(CFOps.meanCentered(r), Seq(1L), p)
    assert(sims.count() == 0)  // sim = -1 dropped
  }

  test("pass-through: user who rated the target gets their own rating") {
    val r = mkRatings(
      // target 1 and neighbors 2,3 positively correlated via users 1,2
      (1L, 1L, 5L), (2L, 1L, 1L),
      (1L, 2L, 5L), (2L, 2L, 1L),
      (1L, 3L, 4L), (2L, 3L, 2L),
      // user 3 rates both neighbors but not the target
      (3L, 2L, 4L), (3L, 3L, 4L))
    val p = CFOps.Params(minUsersPerItem = 1, minItemsPerUser = 1)
    val pred = CFOps.recommend(r, Seq(1L), p)
      .select("user_id", "pred").as[(Long, Double)].collect().toMap
    assert(pred(1L) == 5.0)        // own rating passes through
    assert(pred(2L) == 1.0)
    assert(math.abs(pred(3L) - 4.0) < 1e-9)  // weighted avg of 4,4
  }

  test("neighbor cap limits each target's list") {
    val nbrs = CFOps.topNeighbors(CFOps.itemSimilarities(
      CFOps.meanCentered(CFOps.supportFiltered(Ratings.deduped(spark, sf0))),
      Seq(3L, 7L)))
    val counts = nbrs.groupBy("t_item").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 50))
    assert(counts.nonEmpty)
  }

  test("window support chain under one dominant item") {
    // Zipf head: item 1 holds 80% of all ratings (2000 of ~2500), so its
    // entire partition frame lands in ONE WindowExec task (window
    // exchanges are not AQE-skew-splittable — CFOps scaladoc). This pins
    // that the chain stays CORRECT under that skew and documents the
    // cost model: the hot key is a single task, bounded by #users.
    val hot = (1L to 2000L).map(u => (u, 1L, (u % 5) + 1))
    val cold = (1L to 100L).flatMap(u => Seq((u, 2L, 3L), (u, 3L, (u % 2) + 3)))
    val tiny = Seq((1L, 4L, 5L)) // below minUsersPerItem -> filtered
    val r = mkRatings(hot ++ cold ++ tiny: _*).repartition(8)
    val p = CFOps.Params(minUsersPerItem = 25, minItemsPerUser = 1)
    val centered = CFOps.meanCentered(CFOps.supportFiltered(r, p))
    // survivors: items 1,2,3 only; every row of item 1 present exactly once
    val byItem = centered.groupBy("item_id").count().as[(Long, Long)].collect().toMap
    assert(byItem == Map(1L -> 2000L, 2L -> 100L, 3L -> 100L))
    // centering on the hot item matches a groupBy-computed mean exactly
    val hotMean = hot.map(_._3.toDouble).sum / hot.size
    val rc = centered.filter($"item_id" === 1L && $"user_id" === 7L)
      .select("rc").as[Double].head()
    assert(rc == (7 % 5) + 1 - hotMean)
    // and the filter threshold applied: item 4 gone
    assert(!byItem.contains(4L))
  }

  test("support filters are sequential (users counted on surviving items)") {
    val r = mkRatings(
      (1L, 1L, 3L), (2L, 1L, 3L),            // item 1: 2 users -> survives
      (3L, 2L, 3L))                           // item 2: 1 user -> dropped; user 3 with it
    val p = CFOps.Params(minUsersPerItem = 2, minItemsPerUser = 1)
    val f = CFOps.supportFiltered(r, p)
    assert(f.select("user_id").distinct().as[Long].collect().toSet == Set(1L, 2L))
  }

  test("alsUserFactors: closed-form 2x2 matches an independent Breeze ridge solve") {
    val ratings = Seq(
      (1L, 3L, 5L), (1L, 8L, 2L), (1L, 13L, 4L),   // 3-item user
      (2L, 21L, 1L),                               // single-item user (ridge only)
      (3L, 3L, 3L), (3L, 21L, 3L))
      .toDF("user_id", "item_id", "rating")
    val got = CFOps.alsUserFactors(ratings, lambda = 0.1)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    import breeze.linalg.{DenseMatrix, DenseVector}
    def expect(rs: Seq[(Long, Long)]): (Double, Double) = {
      val a = DenseMatrix.zeros[Double](2, 2)
      val b = DenseVector.zeros[Double](2)
      rs.foreach { case (item, r) =>
        val f = DenseVector((10 + item % 7) / 10.0, (5 + item % 11) / 10.0)
        a += f * f.t; b += f * r.toDouble
      }
      a += DenseMatrix.eye[Double](2) * 0.1
      val x = a \ b
      (x(0), x(1))
    }
    for ((u, rs) <- Seq(1L -> Seq((3L, 5L), (8L, 2L), (13L, 4L)),
        2L -> Seq((21L, 1L)), 3L -> Seq((3L, 3L), (21L, 3L)))) {
      val (x1, x2) = expect(rs)
      val (n, g1, g2) = got(u)
      assert(n == rs.size)
      assert(math.abs(g1 - x1) < 1e-5 && math.abs(g2 - x2) < 1e-5,
        s"user $u: ($g1,$g2) vs breeze ($x1,$x2)")
    }
    // residual check: predictions A·x stay near the ratings for the
    // consistent user (ridge shrinks, but not wildly)
    val (_, x1, x2) = got(3L)
    val pred3 = ((10 + 3 % 7) / 10.0) * x1 + ((5 + 3 % 11) / 10.0) * x2
    assert(math.abs(pred3 - 3.0) < 1.0)
  }

  test("alsItemFactors: item half-step matches Breeze given the user factors") {
    val ratings = Seq(
      (1L, 3L, 5L), (1L, 8L, 2L), (2L, 3L, 1L), (3L, 3L, 3L), (3L, 8L, 4L))
      .toDF("user_id", "item_id", "rating")
    val uf = CFOps.alsUserFactors(ratings, lambda = 0.1)
    val ufMap = uf.as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    val got = CFOps.alsItemFactors(ratings, uf, lambda = 0.1)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    import breeze.linalg.{DenseMatrix, DenseVector}
    def expect(rs: Seq[(Long, Long)]): (Double, Double) = {
      val a = DenseMatrix.zeros[Double](2, 2)
      val b = DenseVector.zeros[Double](2)
      rs.foreach { case (u, r) =>
        val x = DenseVector(ufMap(u)._1, ufMap(u)._2)
        a += x * x.t; b += x * r.toDouble
      }
      a += DenseMatrix.eye[Double](2) * 0.1
      val y = a \ b
      (y(0), y(1))
    }
    for ((i, rs) <- Seq(3L -> Seq((1L, 5L), (2L, 1L), (3L, 3L)),
        8L -> Seq((1L, 2L), (3L, 4L)))) {
      val (y1, y2) = expect(rs)
      val (n, g1, g2) = (got(i)._2, got(i)._3, got(i)._4)
      assert(n == rs.size)
      assert(math.abs(g1 - y1) < 1e-5 && math.abs(g2 - y2) < 1e-5,
        s"item $i: ($g1,$g2) vs breeze ($y1,$y2)")
    }
  }
}
