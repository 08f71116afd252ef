package graft

import graft.operators.{DataQualityOps, Ratings, RelationalOps}
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("setDifference is R minus S with set semantics") {
    val r = Seq(1L, 2L, 2L, 3L).toDF("k")
    val s = Seq(2L, 4L).toDF("k")
    val got = RelationalOps.setDifference(r, s, "k").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L))
  }

  test("dedupLast keeps exactly the last row under the given order") {
    val df = Seq((1L, 10L, 3.0, 1L), (1L, 10L, 5.0, 2L), (1L, 11L, 4.0, 1L))
      .toDF("u", "i", "r", "seq")
    val got = RelationalOps.dedupLast(df, Seq("u", "i"), Seq(col("seq")))
      .select("u", "i", "r").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 10L, 5.0), (1L, 11L, 4.0)))
  }

  test("supportFilter thresholds on distinct support") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a")).toDF("item", "user")
    val got = RelationalOps.supportFilter(df, "item", "user", 2)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("two-pass (semi-join) and one-pass (hash-bucket) samplers agree on the sampled population") {
    val ev = Tables.events(spark, sf0)
    val onePass = RelationalOps.hashBucketSample(ev, "user_id", 16, 3)
    val twoPass = RelationalOps.semiJoinSample(ev, "user_id", 16, 3)
    // same rows: the one-pass filter and the semi-join select identical users
    assert(onePass.count() == twoPass.count())
    val a = onePass.agg(round(avg($"value"), 6).cast("double")).as[Double].head()
    val b = twoPass.agg(round(avg($"value"), 6).cast("double")).as[Double].head()
    assert(a == b)
  }

  test("ratings dedup is deterministic and unique per (user,item)") {
    val r = Ratings.deduped(spark, sf0)
    val dupes = r.groupBy("user_id", "item_id").count().filter($"count" > 1).count()
    assert(dupes == 0L)
    assert(r.count() > 0)
  }

  test("weightedSampleExact overselects heavy rows and is deterministic") {
    import graft.operators.RelationalOps
    // 500 rows: ids 0-249 weight 1, ids 250-499 weight 20 — the heavy
    // half should dominate a 100-row draw (A-ES inclusion scales with w)
    val df = (0L until 500L).map(i => (i, if (i < 250) 1L else 20L))
      .toDF("id", "w")
    val got = RelationalOps.weightedSampleExact(df, col("id"), col("w"), 100, "s")
      .select("id").as[Long].collect().toSet
    assert(got.size == 100)
    val heavy = got.count(_ >= 250)
    assert(heavy > 75, s"heavy rows in sample: $heavy") // ~95 expected, 50 if unweighted
    // deterministic: same seed → same draw; different seed → different
    val again = RelationalOps.weightedSampleExact(df, col("id"), col("w"), 100, "s")
      .select("id").as[Long].collect().toSet
    assert(again == got)
    val other = RelationalOps.weightedSampleExact(df, col("id"), col("w"), 100, "t")
      .select("id").as[Long].collect().toSet
    assert(other != got)
  }

  test("weightedSampleExact with k >= n returns everything") {
    import graft.operators.RelationalOps
    val df = (0L until 10L).map(i => (i, i + 1)).toDF("id", "w")
    assert(RelationalOps.weightedSampleExact(df, col("id"), col("w"), 50, "s")
      .count() == 10)
  }

  test("stratifiedWeightedSampleExact: k per group, weight-biased within group") {
    import graft.operators.RelationalOps
    // group A: ids 0-199 (weight 1 for id<100, 20 otherwise); group B small
    val df = (0L until 200L).map(i => ("a", i, if (i < 100) 1L else 20L))
      .++(Seq(("b", 900L, 1L))).toDF("g", "id", "w")
    val got = RelationalOps.stratifiedWeightedSampleExact(
      df, Seq("g"), col("id"), col("w"), 40, "s")
      .select("g", "id").as[(String, Long)].collect()
    assert(got.count(_._1 == "a") == 40 && got.count(_._1 == "b") == 1)
    val heavy = got.count { case (g, id) => g == "a" && id >= 100 }
    assert(heavy > 30, s"heavy in-group rows drawn: $heavy") // ~20 if unweighted
  }

  test("weighted samplers fail fast on non-positive weights") {
    import graft.operators.RelationalOps
    val df = Seq((1L, 0L), (2L, 5L)).toDF("id", "w")
    val e = intercept[Exception] {
      RelationalOps.weightedSampleExact(df, col("id"), col("w"), 1, "s").collect()
    }
    assert(e.getMessage.contains("strictly positive")
      || e.getCause != null && e.getCause.getMessage.contains("strictly positive"),
      e.getMessage)
  }

  test("groupSplit: partitions cover all rows, keys never straddle splits") {
    val df = (1 to 200).flatMap(u => (1 to 3).map(r => (u.toLong, r)))
      .toDF("user_id", "row")
    val sp = RelationalOps.groupSplit(df, "user_id", Seq(0.8, 0.1, 0.1), "s")
    assert(sp.count() == 600L)
    // every key entirely inside one split
    assert(sp.groupBy("user_id")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count() == 0L)
    // all three splits occupied and ordered roughly by fraction
    val sizes = sp.groupBy("split").count().orderBy("split")
      .as[(Int, Long)].collect().toList
    assert(sizes.map(_._1) == List(0, 1, 2))
    assert(sizes.head._2 > sizes(1)._2 && sizes.head._2 > sizes(2)._2)
  }

  test("winsorizedStats: clip counts at interpolated bounds, means rounded") {
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("g", "v")
    val got = RelationalOps.winsorizedStats(df, "g", "v", 0.05, 0.95,
        c => round(avg(c), 4))
      .as[(String, Long, Long, Long, Double, Double)].head()
    // p05 = 1.95, p95 = 19.05 -> exactly {1} and {20} clip; the
    // symmetric clip keeps the mean at 10.5 on this uniform ramp
    assert(got == (("g", 20L, 1L, 1L, 10.5, 10.5)))
  }

  test("robustZScores: median/MAD scoring, zero-MAD gives null not infinity") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).zipWithIndex
      .map { case (v, i) => ("a", i, v) } ++
      Seq(("c", 10, 7.0), ("c", 11, 7.0), ("c", 12, 7.0)))
      .toDF("g", "id", "v")
    val got = RelationalOps.robustZScores(df, "g", "v")
      .select(col("g"), col("id"), col("z"), col("is_outlier"))
      .as[(String, Int, Option[Double], Option[Boolean])]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // LOWER median (rank (6+1) div 2 = 3) = 3; deviations sorted
    // 0,1,1,2,2,97 -> MAD = 1; scores publish RAW (same IEEE chain as
    // the engine, bit-equal)
    assert(got(("a", 5)) == ((Some(0.6745 * (100.0 - 3.0) / 1.0), Some(true))))
    assert(got(("a", 0)) == ((Some(0.6745 * (1.0 - 3.0) / 1.0), Some(false))))
    // constant group: MAD 0 -> null score and null flag
    assert(got(("c", 10)) == ((None, None)))
  }

  test("skyline2D matches brute-force dominance on ties, duplicates, equal axes") {
    // hand-picked pathologies: duplicate points (both survive), same-x
    // pairs (higher y kills lower), same-y pairs (higher x kills
    // lower), a clean frontier diagonal
    val pts = Seq(
      (1L, 10L, 5.0), (2L, 10L, 7.0),  // same x: only id 2 can live
      (3L, 20L, 7.0),                  // same y as 2, higher x: kills 2
      (4L, 30L, 3.0), (5L, 30L, 3.0),  // duplicates: both live or both die
      (6L, 40L, 1.0),                  // frontier corner (max x)
      (7L, 5L, 9.0),                   // frontier corner (max y)
      (8L, 19L, 6.9)                   // strictly inside: dies
    ).toDF("id", "x", "y")
    def brute(rows: Seq[(Long, Long, Double)]): Set[Long] =
      rows.filter { p =>
        !rows.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
          (q._2 > p._2 || q._3 > p._3))
      }.map(_._1).toSet
    val all = pts.as[(Long, Long, Double)].collect().toSeq
    for (width <- Seq(1L, 7L, 100L)) { // one bucket per x / mixed / single bucket
      val got = RelationalOps.skyline2D(pts, "x", "y", width)
        .select("id").as[Long].collect().toSet
      assert(got == brute(all), s"bucketWidth=$width")
    }
  }

  test("skyline2D randomized parity against brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(40).toLong, (rnd.nextInt(25) / 3.0)))
    val pts = rows.toDF("id", "x", "y")
    val brute = rows.filter { p =>
      !rows.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    }.map(_._1).toSet
    val got = RelationalOps.skyline2D(pts, "x", "y", 8L)
      .select("id").as[Long].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("assocRules: known baskets — counts, confidence and lift by hand") {
    // baskets: {1,2,3}, {1,2}, {2,3}, {1,2} (with an in-basket dup of 2)
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L),
      (13L, 1L), (13L, 2L), (13L, 2L) // dup item: must count once
    ).toDF("bk", "it")
    val got = RelationalOps.assocRules(baskets, "bk", "it", minSupport = 2)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // n=4 baskets; items: 1→3, 2→4, 3→2; pairs: (1,2)→3, (1,3)→1, (2,3)→2
    assert(got == Seq(
      (1L, 2L, 3L, 3L, 4L, 3.0 / 3.0, 3.0 / 4.0, (3.0 * 4.0) / (3.0 * 4.0)),
      (2L, 3L, 2L, 4L, 2L, 2.0 / 4.0, 2.0 / 2.0, (2.0 * 4.0) / (4.0 * 2.0))))
    // (1,3) support 1 < minSupport: filtered
    assert(!got.exists(r => r._1 == 1L && r._2 == 3L))
  }

  test("profile: stats by hand, nulls and duplicates counted right") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.5, 10L), (2.5, 10L), (null, 20L), (2.5, null), (4.0, 30L)
    ).toDF("a", "b")
    val got = RelationalOps.profile(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, Option[Double], Option[Double], Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("a", Some(1.5), Some(4.0), 1L, 3L, 5L),
      ("b", Some(10.0), Some(30.0), 1L, 3L, 5L)))
  }

  test("dpNoisyCounts: deterministic, noise Laplace-scaled, seed changes the draw") {
    val ev = Tables.events(spark, sf0)
    val a = DataQualityOps.dpNoisyCounts(ev, "event_type", eps = 0.5, "dp1")
      .select("event_type", "noisy_n").as[(String, Double)].collect().toMap
    val truth = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(a.keySet == truth.keySet && a.nonEmpty)
    // Laplace(b=2): P(|noise| > 20) = e^{-10} ≈ 5e-5 — deterministic
    // fixed draw, so this is a fixed fact, not a flaky bound
    a.foreach { case (k, v) =>
      assert(math.abs(v - truth(k)) < 20.0, s"$k: $v vs ${truth(k)}") }
    // some noise was actually added
    assert(a.exists { case (k, v) => v != truth(k).toDouble })
    // repartitioning must not change the draw; a new seed must
    val b = DataQualityOps.dpNoisyCounts(ev.repartition(7), "event_type", 0.5, "dp1")
      .select("event_type", "noisy_n").as[(String, Double)].collect().toMap
    assert(b == a)
    val c = DataQualityOps.dpNoisyCounts(ev, "event_type", 0.5, "dp2")
      .select("event_type", "noisy_n").as[(String, Double)].collect().toMap
    assert(c != a)
  }

  test("correlationMatrix matches Spark's corr; zero variance nulls; perfect corr = ±1") {
    // y = 2x (corr 1), z = -x (corr -1 with x), c constant (null)
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
      .toDF("x", "y", "z", "c")
    val got = RelationalOps.correlationMatrix(df, Seq("x", "y", "z", "c"))
      .select("col_a", "col_b", "corr")
      .as[(String, String, Option[Double])].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(got(("x", "y")).contains(1.0))
    assert(got(("x", "z")).contains(-1.0))
    assert(got(("x", "c")).isEmpty && got(("y", "c")).isEmpty)
    // against the built-in estimator on real data (double tolerance:
    // different but equivalent formulas)
    val li = Tables.lineitem(spark, sf0)
    val builtin = li.agg(corr(col("l_quantity"), col("l_extendedprice")))
      .as[Double].head()
    val mine = RelationalOps.correlationMatrix(li,
        Seq("l_quantity", "l_extendedprice"))
      .select("corr").as[Double].head()
    assert(math.abs(builtin - mine) < 1e-6, s"$builtin vs $mine")
  }

  test("snapshotDiff: insert/update/delete classified, unchanged dropped, null-safe") {
    val prev = Seq[(Long, java.lang.Double, String)](
      (1L, 1.0, "x"), (2L, 2.0, "y"), (3L, null, "z"), (4L, 4.0, "w")
    ).toDF("k", "v", "s")
    val cur = Seq[(Long, java.lang.Double, String)](
      (1L, 1.0, "x"),      // unchanged -> dropped
      (2L, 2.5, "y"),      // value update
      (3L, 3.0, "z"),      // null -> value IS a change
      (5L, 5.0, "q")       // insert; 4 missing -> delete
    ).toDF("k", "v", "s")
    val got = RelationalOps.snapshotDiff(prev, cur, Seq("k"))
      .orderBy("k")
      .as[(Long, String, Option[Double], Option[Double], Option[String],
        Option[String])]
      .collect().toSeq
    assert(got == Seq(
      (2L, "update", Some(2.0), Some(2.5), Some("y"), Some("y")),
      (3L, "update", None, Some(3.0), Some("z"), Some("z")),
      (4L, "delete", Some(4.0), None, Some("w"), None),
      (5L, "insert", None, Some(5.0), None, Some("q"))))
  }

  test("mergeUpsert: delete drops, upsert replaces, insert appends, rest pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", false), // replace
      (2L, "x", true),   // delete (value ignored)
      (9L, "new", false) // insert
    ).toDF("k", "v", "del")
    val got = RelationalOps.mergeUpsert(base, changes, Seq("k"), "del")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c"), (9L, "new")))
  }

  test("applyCountSumDelta: updates, group moves, and drop-to-zero match a recompute") {
    val dec = "decimal(38,12)"
    val prev = Seq((1L, 10L, 2.0), (2L, 10L, 3.0), (3L, 20L, 5.0), (4L, 30L, 7.0))
      .toDF("k", "g", "v")
    val cur = Seq(
      (1L, 10L, 2.5),  // value update in place
      (2L, 11L, 3.0),  // group move 10 -> 11
      (5L, 20L, 1.0)   // insert into group 20
    ).toDF("k", "g", "v")
    // changes: k=1 update (v), k=2 update (g), k=3 delete, k=4 delete
    // (group 30 drops to zero and must vanish), k=5 insert
    val oldAgg = prev.groupBy(col("g").as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("total"))
    val diff = RelationalOps.snapshotDiff(prev, cur, Seq("k"))
    val got = RelationalOps.applyCountSumDelta(oldAgg, diff, "g", "v")
      .select(col("grp"), col("n"), col("total").cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    val direct = cur.groupBy(col("g").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).cast("double").as("total"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == direct)
    assert(got == Set((10L, 1L, 2.5), (11L, 1L, 3.0), (20L, 1L, 1.0)))
  }

  test("assocRules: pair generation is complete vs a brute-force self-join") {
    val li = spark.read.parquet(s"$sf0/lineitem.parquet")
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
    val got = RelationalOps.assocRules(li, "bk", "it", minSupport = 1)
      .select("item_a", "item_b", "n_ab")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => ((a, b), n) }.toMap
    val items = li.distinct().as[(Long, Long)].collect()
    val byBasket = items.groupBy(_._1).values
    val expected = byBasket.toSeq.flatMap { rows =>
      val s = rows.map(_._2).sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    assert(got == expected && got.nonEmpty)
  }

  test("cascadeDeleteReport: FK cascade counts exact, empty request list deletes nothing") {
    val cust = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val ords = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1), (10L, 2), (11L, 1), (12L, 1)).toDF("l_orderkey", "l_linenumber")
    val ev = Seq((1L, 100L), (3L, 101L)).toDF("user_id", "event_id")
    val del = Seq(1L).toDF("custkey")
    val got = RelationalOps.cascadeDeleteReport(cust, ords, li, ev, del)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("customer") == (("customer", 3L, 1L, 2L)))
    assert(got("orders") == (("orders", 3L, 2L, 1L)))   // orders 10, 11
    assert(got("lineitem") == (("lineitem", 4L, 3L, 1L))) // items of 10, 11
    assert(got("events") == (("events", 2L, 1L, 1L)))
    val none = RelationalOps.cascadeDeleteReport(cust, ords, li, ev,
      Seq.empty[Long].toDF("custkey"))
      .as[(String, Long, Long, Long)].collect()
    assert(none.forall(r => r._3 == 0L && r._2 == r._4))
  }

  test("rfmSegments: distinct metrics score 1..5; ties share a score") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    // 5 customers, strictly increasing last-order date / freq / spend
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong * 10, ts(f"2024-01-${c + 10}%02d 00:00:00"),
        100.0 * c))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = RelationalOps.rfmSegments(orders)
      .select("o_custkey", "recency_days", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // cust 5: most recent (0 days -> r 1), freq 5 (f 5), 500/order
    assert(got(50L) == ((50L, 0L, 1L, 5L, 5L, "155")))
    // cust 1: oldest (4 days -> r 5), freq 1, 100 total -> lowest f/m
    assert(got(10L) == ((10L, 4L, 5L, 1L, 1L, "511")))
    // ties: two customers with identical metrics share every score
    val tied = Seq(
      (1L, ts("2024-01-01 00:00:00"), 50.0),
      (2L, ts("2024-01-01 00:00:00"), 50.0),
      (3L, ts("2024-01-05 00:00:00"), 99.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val t = RelationalOps.rfmSegments(tied)
      .select("o_custkey", "segment").as[(Long, String)].collect().toMap
    assert(t(1L) == t(2L) && t(1L) != t(3L))
  }

  test("kAnonymize: ladder releases, generalizes, collapses; k honored") {
    // (n1,SEG_A):2 + (n1,SEG_B):2 (each < 3) -> level-1 n1:4 released
    // (n2,SEG_A):1 -> falls through to the ('ANY','ANY') bucket
    // (n3,SEG_A):4 -> level-0 released with k=3
    val rows = Seq.fill(2)((1, "SEG_A")) ++ Seq.fill(2)((1, "SEG_B")) ++
      Seq((2, "SEG_A")) ++ Seq.fill(4)((3, "SEG_A"))
    val df = rows.toDF("nat", "seg")
    val got = DataQualityOps.kAnonymize(df, col("nat"), col("seg"), k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    assert(got == Set(
      ("3", "SEG_A", 4L, 0),
      ("1", "ANY", 4L, 1),
      ("ANY", "ANY", 1L, 2)))
    // every released row with a live quasi-identifier covers >= k
    assert(got.filter(_._4 < 2).forall(_._3 >= 3))
    // all-released corpus: no generalized rows at all
    val clean = Seq.fill(3)((1, "SEG_A")).toDF("nat", "seg")
    val g2 = DataQualityOps.kAnonymize(clean, col("nat"), col("seg"), k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    assert(g2 == Set(("1", "SEG_A", 3L, 0)))
  }

  test("lDiversity: homogeneous group flagged, diverse group passes") {
    // (1,X): sensitive {s1,s1,s2} → 2 distinct, modal 2 → diverse at l=2
    // (1,Y): {s1,s1} → 1 distinct → flagged (k-anonymity alone would
    // pass it at k=2 — the homogeneity attack l-diversity exists for)
    val df = Seq((1, "X", "s1"), (1, "X", "s1"), (1, "X", "s2"),
      (1, "Y", "s1"), (1, "Y", "s1")).toDF("nat", "seg", "s")
    val got = DataQualityOps.lDiversity(df, col("nat"), col("seg"),
        col("s"), l = 2)
      .select("q1", "q2", "n", "n_sensitive", "top_sensitive_n", "diverse")
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("1", "X", 3L, 2L, 2L, true),
      ("1", "Y", 2L, 1L, 2L, false)))
  }

  test("tCloseness: identical-to-global group has EMD 0; concentrated group flagged") {
    // global bins over s: {1:3, 2:3}; group A mirrors it exactly → EMD 0;
    // group B holds only bin 1 → |0.5·cumdiff| at the single inner
    // boundary: |1 − 0.5| = 0.5 (B−1 = 1 term)
    val df = Seq((1, "A", 1L), (1, "A", 1L), (1, "A", 2L), (1, "A", 2L),
      (1, "B", 1L), (1, "B", 2L)).toDF("nat", "seg", "s")
    val mirror = DataQualityOps.tCloseness(df, col("nat"), col("seg"),
        col("s"), t = 0.2)
      .select("q1", "q2", "n", "emd", "t_close")
      .as[(String, String, Long, Double, Boolean)].collect().toSet
    assert(mirror == Set(
      ("1", "A", 4L, 0.0, true),
      ("1", "B", 2L, 0.0, true))) // B = {1,2} also mirrors the 50/50 global
    // concentrated group: global bins {1:4, 2:2} (N=6, ECDF(1)=2/3);
    // A = {1,2,1,2} → ECDF(1) = 1/2 → EMD = 1/6; C = {1,1} →
    // ECDF(1) = 1 → EMD = 1/3 > t (the homogeneity-by-distribution
    // leak l-diversity would miss if C's two values were distinct)
    val df2 = Seq((1, "A", 1L), (1, "A", 2L), (1, "A", 1L), (1, "A", 2L),
      (1, "C", 1L), (1, "C", 1L)).toDF("nat", "seg", "s")
    val got = DataQualityOps.tCloseness(df2, col("nat"), col("seg"),
        col("s"), t = 0.2)
      .select("q2", "emd", "t_close")
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("C") == ((0.333333333, false)))
    assert(got("A") == ((0.166666667, true)))
  }

  test("benfordCheck: a Benford-exact sample conforms, a flat sample deviates") {
    // 100 values with first-digit counts ~ round(100·log10(1+1/d)):
    // [30,18,12,10,8,7,6,5,4] (sums to 100) → tiny chi2, no deviation
    val benfordish = Seq(30, 18, 12, 10, 8, 7, 6, 5, 4).zipWithIndex
      .flatMap { case (n, i) => Seq.fill(n)((i + 1) * 10.0 + 1.0) }
    val ok = DataQualityOps.benfordCheck(
      benfordish.map(("g", _)).toDF("g", "v"), col("g"), col("v"))
    assert(ok.select("deviates").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(false))
    assert(ok.count() == 9) // full digit axis even though counts vary
    // flat first-digit distribution (same count each digit) deviates
    val flat = (1 to 9).flatMap(d => Seq.fill(20)(d * 100.0 + 7.0))
    val bad = DataQualityOps.benfordCheck(
      flat.map(("g", _)).toDF("g", "v"), col("g"), col("v"))
    assert(bad.select("deviates").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(true))
    // digits absent from the data still appear with n_d = 0
    val sparse = DataQualityOps.benfordCheck(
      Seq(("g", 11.0), ("g", 12.0)).toDF("g", "v"), col("g"), col("v"))
    assert(sparse.filter(col("digit") === 9).head().getAs[Long]("n_d") == 0L)
  }

  test("targetEncodeLoo: each row sees the mean of the OTHER rows; singletons null") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 10.0)).toDF("id", "key", "v")
    val got = RelationalOps.targetEncodeLoo(df, col("id"), col("key"), col("v"))
      .orderBy("id")
      .as[(Long, String, Double, Option[Double])].collect().toList
    assert(got == List(
      (1L, "a", 1.0, Some(2.5)),  // (2+3)/2 — own value excluded
      (2L, "a", 2.0, Some(2.0)),
      (3L, "a", 3.0, Some(1.5)),
      (4L, "b", 10.0, None)))     // no other rows to average
  }

  test("rrFrequency: mass conserved, debias algebra exact, estimates sum to 1; k=1 null") {
    val df = Seq.tabulate(400)(i =>
      (i.toLong, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c"))
      .toDF("id", "cat")
    val got = graft.operators.DataQualityOps
      .rrFrequency(df, col("id"), col("cat"), "t")
      .select("cat", "n_true", "n_reported", "pi_hat")
      .as[(String, Long, Long, Option[Double])].collect().toList.sortBy(_._1)
    // reported mass conserved; truth matches the construction
    assert(got.map(_._2).sum == 400L && got.map(_._3).sum == 400L)
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map("a" -> 100L, "b" -> 100L, "c" -> 200L))
    // debias algebra replays exactly: (4(k−1)f − n)/(n(3k−4)), k = 3
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (_, _, f, pi) =>
      assert(pi.contains(r6((8.0 * f - 400.0) / (400.0 * 5.0)) + 0.0))
    }
    // the unrounded estimates sum to exactly 1 — check at 6dp tolerance
    assert(math.abs(got.flatMap(_._4).sum - 1.0) < 3e-6)
    // a single category leaves nothing to lie about → null estimate
    val g1 = graft.operators.DataQualityOps
      .rrFrequency(Seq((1L, "x"), (2L, "x")).toDF("id", "cat"),
        col("id"), col("cat"), "t")
      .select("n_true", "pi_hat")
      .as[(Long, Option[Double])].collect().toList
    assert(g1 == List((2L, None)))
  }

  test("quantileNormalize: exact ECDF map onto the pooled grid; single group is the identity") {
    // A = {1,1,2,2}, B = {10,10,10,10}; pool ECDF: 1→2/8, 2→4/8, 10→1
    // A's v=1 sits at F=1/2 → first pooled v with F≥1/2 is 2;
    // A's v=2 at F=1 → 10; B's v=10 at F=1 → 10
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 10L), ("B", 10L), ("B", 10L), ("B", 10L)).toDF("g", "v")
    val got = RelationalOps.quantileNormalize(df, col("g"), col("v"))
      .select("grp", "v", "n", "cum_g", "n_g", "mapped")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", 1L, 2L, 2L, 4L, 2L),
      ("A", 2L, 2L, 4L, 4L, 10L),
      ("B", 10L, 4L, 4L, 4L, 10L)))
    // one group: F_g == F_pool pointwise → the map is the identity
    val solo = Seq.tabulate(30)(i => ("only", (i % 7).toLong)).toDF("g", "v")
    val ident = RelationalOps.quantileNormalize(solo, col("g"), col("v"))
      .select("v", "mapped").as[(Long, Long)].collect()
    assert(ident.forall { case (v, m) => v == m })
  }
}
