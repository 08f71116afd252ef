package graft

import graft.operators.{EvalOps, SimilarityOps, TextAnalysisOps}
import org.apache.spark.sql.functions._

class EvalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc matches the closed form on a hand-computed tied case") {
    // scores: pos at {3, 2, 2}, neg at {1, 2, 0} → pairs (p,n):
    // wins: (3>1,3>2,3>0, 2>1,2>0, 2>1,2>0) = 7, ties: (2=2)×2 → 0.5 each
    // AUC = (7 + 2·0.5) / 9 = 8/9
    val df = Seq((3, 1), (2, 1), (2, 1), (1, 0), (2, 0), (0, 0))
      .toDF("score", "y")
    val out = EvalOps.rocAuc(df, col("score"), col("y") === 1)
    val auc = out.select("auc").head().getDouble(0)
    assert(math.abs(auc - 8.0 / 9.0) < 1e-8)
    // curve endpoints: lowest threshold row has tpr = fpr = 1
    val last = out.orderBy("score").head()
    assert(last.getAs[Double]("tpr") == 1.0 && last.getAs[Double]("fpr") == 1.0)
    // perfect separation → AUC 1, reversed → 0
    val sep = Seq((5, 1), (4, 1), (1, 0), (0, 0)).toDF("score", "y")
    assert(EvalOps.rocAuc(sep, col("score"), col("y") === 1)
      .select("auc").head().getDouble(0) == 1.0)
    assert(EvalOps.rocAuc(sep, col("score"), col("y") === 0)
      .select("auc").head().getDouble(0) == 0.0)
  }

  test("prAuc matches the step-interpolated average precision by hand") {
    // blocks desc: s=3 (tp 1, fp 0, P 1), s=2 (tp 3, fp 1, P 3/4)
    // AP = ((1/3)*1 + (2/3)*(3/4)) = 5/6
    val df = Seq((3, 1), (2, 1), (2, 1), (1, 0), (2, 0), (0, 0))
      .toDF("score", "y")
    val out = EvalOps.prAuc(df, col("score"), col("y") === 1)
    val ap = out.select("ap").head().getDouble(0)
    assert(math.abs(ap - 5.0 / 6.0) < 1e-6)
    // recall reaches 1 at the lowest threshold; precision ends at P/(P+N)
    val last = out.orderBy("score").head()
    assert(last.getAs[Double]("recall") == 1.0)
    assert(math.abs(last.getAs[Double]("precision") - 0.5) < 1e-9)
    // perfect ranking → AP 1
    val sep = Seq((5, 1), (4, 1), (1, 0), (0, 0)).toDF("score", "y")
    assert(EvalOps.prAuc(sep, col("score"), col("y") === 1)
      .select("ap").head().getDouble(0) == 1.0)
  }

  test("calibration bins a perfectly calibrated score to ECE 0") {
    // bin [0.2, 0.3): conf always 0.25, positives exactly 1 in 4
    val rows = (0 until 80).map(i => (0.25, if (i % 4 == 0) 1 else 0))
    val out = EvalOps.calibration(rows.toDF("conf", "y"),
      col("conf"), col("y") === 1, nBins = 10)
    val r = out.head()
    assert(r.getAs[Long]("bin") == 2L)
    assert(r.getAs[Double]("acc") == 0.25 && r.getAs[Double]("avg_conf") == 0.25)
    assert(r.getAs[Double]("ece") == 0.0)
  }

  test("ndcg is 1 for the ideal ranking and below 1 for a swapped one") {
    val rels = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L))
      .toDF("q_id", "nn_id", "rel")
    val ideal = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("q_id", "nn_id", "pos")
    val got = EvalOps.ndcgAtK(ideal, rels, 10).head()
    assert(got.getAs[Double]("ndcg") == 1.0)
    assert(got.getAs[Long]("n_rel") == 3L && got.getAs[Long]("n_rel_ranked") == 3L)
    // worst of the three orderings: rel-1 doc first, rel-3 doc last
    val swapped = Seq((1L, 12L, 1L), (1L, 11L, 2L), (1L, 10L, 3L))
      .toDF("q_id", "nn_id", "pos")
    val nd = EvalOps.ndcgAtK(swapped, rels, 10).head().getAs[Double]("ndcg")
    assert(nd < 1.0 && nd > 0.5)
    // ranking a doc with no relevance entry contributes gain 0
    val stray = Seq((1L, 99L, 1L), (1L, 10L, 2L)).toDF("q_id", "nn_id", "pos")
    val s = EvalOps.ndcgAtK(stray, rels, 10).head()
    assert(s.getAs[Long]("n_rel_ranked") == 1L && s.getAs[Double]("ndcg") < 1.0)
  }

  test("psi is 0 on identical distributions and grows under a shift") {
    val ref = (0 until 100).map(i => i % 5).toDF("bin5")
    val same = EvalOps.psi(ref, ref, col("bin5"), nBins = 5)
    assert(same.select("psi").head().getDouble(0) == 0.0)
    val shifted = (0 until 100).map(i => if (i < 80) 0 else 1).toDF("bin5")
    val moved = EvalOps.psi(ref, shifted, col("bin5"), nBins = 5)
      .select("psi").head().getDouble(0)
    assert(moved > 0.25) // "shifted" territory on the standard PSI scale
    // absent bin on one side survives via Laplace smoothing (no ±inf/NaN)
    assert(!moved.isInfinite && !moved.isNaN)
  }

  test("labelNoise flags exactly the strict-minority-agreement nodes") {
    // 6 points on a line, labels: A A A B A A → the lone B's 5 neighbors
    // all disagree; its neighbors keep majority agreement
    val emb = (0 until 6).map { i =>
      (i.toLong, Array.tabulate(4)(d => if (d == 0) i.toFloat else 1f),
        if (i == 3) 1 else 0)
    }.toDF("vec_id", "embedding", "label")
    val out = EvalOps.labelNoise(SimilarityOps.knnLists(emb, 5), emb)
      .orderBy("vec_id").collect()
    assert(out.length == 6)
    val suspect = out.filter(_.getAs[Boolean]("suspect")).map(_.getLong(0)).toSet
    assert(suspect == Set(3L))
    assert(out.forall(_.getAs[Long]("n_neighbors") == 5L))
  }

  test("lorenzGini: equal masses give 0, concentrated mass approaches 1") {
    val equal = Seq.fill(50)(7).toDF("v")
    assert(EvalOps.lorenzGini(equal, col("v"))
      .select("gini").head().getDouble(0) == 0.0)
    val conc = (Seq.fill(99)(0) :+ 9900).toDF("v")
    val g = EvalOps.lorenzGini(conc, col("v")).select("gini").head().getDouble(0)
    assert(g == 0.99) // exact: 1 − (99·0 + 1·T·1)/(100·T) = 0.99
    // Lorenz curve is monotone and ends at (1, 1)
    val pts = EvalOps.lorenzGini((1 to 20).toDF("v"), col("v"))
      .orderBy("v").select("lorenz_p", "lorenz_l").as[(Double, Double)].collect()
    assert(pts.last == ((1.0, 1.0)))
    assert(pts.sliding(2).forall { case Array(a, b) => a._2 <= b._2; case _ => true })
  }

  test("rocAucBySlice matches per-slice closed forms and nulls degenerate slices") {
    val df = Seq(
      // slice A: perfect separation → 1.0
      ("A", 5, 1), ("A", 4, 1), ("A", 1, 0), ("A", 0, 0),
      // slice B: the tied 8/9 case from the global test
      ("B", 3, 1), ("B", 2, 1), ("B", 2, 1), ("B", 1, 0), ("B", 2, 0), ("B", 0, 0),
      // slice C: all positive → undefined
      ("C", 7, 1), ("C", 9, 1)).toDF("slice", "score", "y")
    val out = EvalOps.rocAucBySlice(df, col("slice"), col("score"), col("y") === 1)
      .orderBy("slice").collect()
    assert(out(0).getAs[Double]("auc") == 1.0)
    assert(math.abs(out(1).getAs[Double]("auc") - 8.0 / 9.0) < 1e-8)
    assert(out(2).isNullAt(out(2).fieldIndex("auc")))
    assert(out(2).getAs[Long]("n_tot") == 0L)
  }

  test("conformalOutliers: exact rank thresholds and validity on exchangeable data") {
    // calib scores 1..99; at α=0.1, r = ⌈0.9·100⌉ = 90 → threshold 90
    val calib = (1 to 99).toDF("s")
    val eval_ = (1 to 200).map(i => 1 + (i * 7) % 99).toDF("s")
    val out = EvalOps.conformalOutliers(calib, eval_, col("s"), Seq(0.1, 0.05))
      .orderBy(col("alpha").desc).collect()
    assert(out(0).getAs[Long]("r") == 90L &&
      out(0).getAs[Long]("threshold") == 90L)
    assert(out(1).getAs[Long]("r") == 95L &&
      out(1).getAs[Long]("threshold") == 95L)
    // same-distribution eval: flag rate within the published bound
    assert(out.forall(_.getAs[Boolean]("valid")))
    // the double-ceil trap case: α=0.1, n+1=10 must give r=9, not 10
    val tiny = EvalOps.conformalOutliers((1 to 9).toDF("s"),
      (1 to 9).toDF("s"), col("s"), Seq(0.1)).head()
    assert(tiny.getAs[Long]("r") == 9L)
  }

  test("ksDrift: D is 0 on identical samples and exact on a known split") {
    val a = (1 to 100).toDF("v")
    val same = EvalOps.ksDrift(a, a, col("v")).select("d_stat").head().getDouble(0)
    assert(same == 0.0)
    // a = {1..50}, b = {51..100}: ECDFs never overlap → D = 1
    val disjoint = EvalOps.ksDrift((1 to 50).toDF("v"), (51 to 100).toDF("v"),
      col("v"))
    val r = disjoint.orderBy("v").collect()
    assert(r.map(_.getAs[Double]("d_stat")).distinct.toSeq == Seq(1.0))
    assert(r.head.getAs[Boolean]("reject_05"))
    // max gap at v=50: |50·50 − 0·50| / 2500 = 1
    assert(r(49).getAs[Double]("diff") == 1.0)
  }

  test("psiByGroup scores each group independently against the reference") {
    val ref = Seq((0L, 50L), (1L, 30L), (2L, 20L)).toDF("bin", "cnt_ref")
    // group 10 mirrors the reference exactly (scaled), group 20 is shifted
    val cur = Seq((10L, 0L, 5L), (10L, 1L, 3L), (10L, 2L, 2L),
      (20L, 0L, 10L)).toDF("grp", "bin", "cnt")
    val out = EvalOps.psiByGroup(cur, ref, nBins = 3).collect()
    assert(out.length == 6) // 2 groups × full 3-bin reference axis
    val psi10 = out.filter(_.getLong(0) == 10L).head.getAs[Double]("psi")
    val psi20 = out.filter(_.getLong(0) == 20L).head.getAs[Double]("psi")
    // scaled-identical distribution: tiny PSI (Laplace-only residue)
    assert(math.abs(psi10) < 0.01)
    assert(psi20 > 0.25)
    // group 20's absent bins surface with cnt 0, not dropped rows
    assert(out.count(r => r.getLong(0) == 20L && r.getAs[Long]("cnt") == 0L) == 2)
  }

  test("hardNegatives never surfaces a same-label vector") {
    val emb = Tables.embeddings(spark, sf0)
    val out = SimilarityOps.hardNegatives(emb, col("vec_id") < 5, 5).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Int]("label_q") != r.getAs[Int]("label_n")))
    // ranks are dense 1..k per query
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall(_.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5)))
  }

  test("equiDepth: uniform data splits evenly; a heavy value bulges its bucket") {
    import graft.operators.DataQualityOps
    val uniform = (1 to 100).toDF("v")
    val even = DataQualityOps.equiDepth(uniform, col("v"), 10)
      .orderBy("bucket").collect()
    assert(even.length == 10)
    assert(even.forall(_.getAs[Long]("n_rows") == 10L))
    // bounds tile: bucket 0 is (null, 10], bucket 9 is (90, null)
    assert(even.head.isNullAt(even.head.fieldIndex("lo")) &&
      even.head.getAs[Long]("hi") == 10L)
    assert(even.last.getAs[Long]("lo") == 90L &&
      even.last.isNullAt(even.last.fieldIndex("hi")))
    // 91 copies of one value: the first bucket must hold them all
    val heavy = (Seq.fill(91)(5) ++ (6 to 14)).toDF("v")
    val h = DataQualityOps.equiDepth(heavy, col("v"), 10)
      .orderBy("bucket").collect()
    assert(h.head.getAs[Long]("n_rows") == 91L)
    assert(math.abs(h.head.getAs[Double]("depth_frac") - 0.91) < 1e-9)
  }

  test("skewReport ranks hot keys with exact share and mean ratio") {
    import graft.operators.DataQualityOps
    // key 1: 80 rows, keys 2..21: 1 row each → mean = 100/21
    val df = (Seq.fill(80)(1) ++ (2 to 21)).toDF("k")
    val out = DataQualityOps.skewReport(df, col("k"), 3)
      .orderBy("rank").collect()
    assert(out.length == 3)
    val topRow = out.head
    assert(topRow.getAs[Int]("key") == 1 && topRow.getAs[Long]("n") == 80L)
    assert(topRow.getAs[Double]("share") == 0.8)
    assert(topRow.getAs[Double]("skew_vs_mean") == 16.8) // 80·21/100
    // ties broken to the smaller key
    assert(out(1).getAs[Int]("key") == 2 && out(2).getAs[Int]("key") == 3)
  }

  test("featureHash is sign-consistent and collision-bounded") {
    // epsilon/omega hash to buckets 35/22, away from alpha's 61
    val docs = Seq((0L, "alpha epsilon omega alpha"), (1L, "alpha")).toDF("doc_id", "text")
    val out = TextAnalysisOps.featureHash(docs, nBuckets = 64).collect()
    // same token in different docs lands in the same signed bucket
    val a0 = out.filter(r => r.getLong(0) == 0L)
    val a1 = out.filter(r => r.getLong(0) == 1L)
    assert(a1.length == 1)
    val (b1, v1) = (a1.head.getAs[Long]("bucket"), a1.head.getAs[Long]("v"))
    val matching = a0.find(_.getAs[Long]("bucket") == b1).get
    // doc 0 has "alpha" twice → its bucket carries 2× the signed unit
    assert(matching.getAs[Long]("v") == 2L * v1)
    assert(math.abs(v1) == 1L)
    // norm2 = sum of squares of this doc's bucket values
    assert(a0.head.getAs[Long]("norm2") == a0.map(r => {
      val v = r.getAs[Long]("v"); v * v
    }).sum)
  }

  test("confusionReport: per-class P/R/F1 exact; never-predicted class NULLs") {
    // true a: 3 (2 right, 1 -> b); true b: 2 (both -> b); true c: 1 -> a
    val scored = Seq(("a", "a"), ("a", "a"), ("a", "b"),
      ("b", "b"), ("b", "b"), ("c", "a")).toDF("t", "p")
    val got = EvalOps.confusionReport(scored, col("t"), col("p"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5)))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a: support 3, tp 2, prec 2/3 (3 predicted a), rec 2/3
    assert(got("a") == ((3L, 2L, Some(r6(2.0 / 3)), Some(r6(2.0 / 3)),
      Some(r6(2.0 * (2.0 / 3) * (2.0 / 3) / (2.0 / 3 + 2.0 / 3))))))
    // b: support 2, tp 2, prec 2/3, rec 1
    assert(got("b")._4 == Some(1.0) && got("b")._3 == Some(r6(2.0 / 3)))
    // c: never predicted -> precision NULL, recall 0, f1 NULL
    assert(got("c") == ((1L, 0L, None, Some(0.0), None)))
  }

  test("welchTTest: matches hand Welch formula; degenerate arms NULL") {
    // g: v0 units {0,2} -> x {1,3}; v1 units {1,3} -> x {4,8}
    val rows = Seq(("g", 0L, 1.0), ("g", 2L, 3.0), ("g", 1L, 4.0), ("g", 3L, 8.0),
      ("tiny", 0L, 5.0), ("tiny", 1L, 6.0)) // n=1 per arm -> NULL
    val df = rows.toDF("grp", "unit", "x")
    val got = EvalOps.welchTTest(df, col("grp"), col("unit"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          Option(r.get(5)), Option(r.get(6)), r.getBoolean(7))).toMap
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (m0, m1) = (2.0, 6.0)
    val (v0, v1) = (2.0, 8.0) // sample variances of {1,3}, {4,8}
    val se2 = v0 / 2 + v1 / 2
    val tExp = r6((m1 - m0) / math.sqrt(se2))
    val dfExp = r6(se2 * se2 / (v0 * v0 / (2 * 2 * 1) + v1 * v1 / (2 * 2 * 1)))
    val g = got("g")
    assert(g == ((2L, 2L, 2.0, 6.0, Some(tExp), Some(dfExp), math.abs(tExp) > 1.96)))
    assert(got("tiny")._5.isEmpty && !got("tiny")._7)
  }

  test("abTest: pooled z matches hand formula; degenerate groups publish NULL") {
    // group g: variant 0 (even units) 2/4 success, variant 1 (odd) 3/4
    val rows =
      (0 until 4).map(u => ("g", u.toLong * 2, u < 2)) ++      // v0: 2 of 4
      (0 until 4).map(u => ("g", u.toLong * 2 + 1, u < 3)) ++  // v1: 3 of 4
      Seq(("one_sided", 2L, true), ("one_sided", 4L, false)) ++ // no v1 units
      Seq(("all_hit", 1L, true), ("all_hit", 2L, true))         // pp = 1 -> se 0
    val df = rows.toDF("grp", "unit", "succ")
    val got = EvalOps.abTest(df, col("grp"), col("unit"), col("succ"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]), r.getBoolean(6))).toMap
    val (p0, p1, pp) = (0.5, 0.75, 5.0 / 8)
    val zExp = BigDecimal((p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("g") == ((4L, 2L, 4L, 3L, Some(zExp), false)))
    assert(got("one_sided")._5.isEmpty && !got("one_sided")._6)
    assert(got("all_hit")._5.isEmpty && !got("all_hit")._6)
  }

  test("cohenKappa: hand-checked 2x2, constant annotators publish null") {
    // cm: (x,x)=1, (x,y)=1, (y,y)=2 → po = 3/4; marginals a: x=2,y=2,
    // b: x=1,y=3 → pe = (2·1 + 2·3)/16 = 1/2 → kappa = 1/2 everywhere
    val df = Seq((1L, "x", "x"), (2L, "x", "y"), (3L, "y", "y"),
      (4L, "y", "y")).toDF("id", "a", "b")
    val got = EvalOps.cohenKappa(df, col("a"), col("b")).orderBy("label")
      .as[(String, Long, Double, Double, Option[Double])].collect().toList
    assert(got == List(
      ("ALL", 4L, 0.75, 0.5, Some(0.5)),
      ("x", 4L, 0.75, 0.5, Some(0.5)),
      ("y", 4L, 0.75, 0.5, Some(0.5))))
    // both annotators constant → pe = 1 → kappa undefined (null)
    val g2 = EvalOps.cohenKappa(
        Seq((1L, "x", "x"), (2L, "x", "x")).toDF("id", "a", "b"),
        col("a"), col("b")).orderBy("label")
      .as[(String, Long, Double, Double, Option[Double])].collect().toList
    assert(g2 == List(("ALL", 2L, 1.0, 1.0, None), ("x", 2L, 1.0, 1.0, None)))
    // label predicted by only one annotator still gets a row (kappa 0:
    // never-predicted class agrees with chance exactly)
    val g3 = EvalOps.cohenKappa(
        Seq((1L, "x", "y"), (2L, "x", "x")).toDF("id", "a", "b"),
        col("a"), col("b")).orderBy("label")
      .as[(String, Long, Double, Double, Option[Double])].collect().toList
    assert(g3.filter(_._1 == "y") ==
      List(("y", 2L, 0.5, 0.5, Some(0.0))))
  }

  test("woeIv: symmetric 2-bin case — ±ln2 WoE, hand-checked IV") {
    // bin 0: g=3,b=1; bin 1: g=1,b=3 → G=B=4, k=2
    // woe0 = ln((4·6)/(2·6)) = ln 2; woe1 = −ln 2 (smoothed, exact-int)
    val df = (Seq.fill(3)((0L, true)) ++ Seq((0L, false), (1L, true))
      ++ Seq.fill(3)((1L, false))).toDF("bin", "y")
    val got = EvalOps.woeIv(df, col("bin"), col("y"))
      .orderBy(col("bin").asc_nulls_last)
      .as[(Option[Long], Long, Long, Option[Double], Double)].collect().toList
    def r(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w9 = r(math.log(2.0), 9)
    val iv9 = r((4.0 / 6 - 2.0 / 6) * w9, 9)
    val ivTot = r(BigDecimal(iv9).*(BigDecimal(2)).toDouble, 6)
    assert(got == List(
      (Some(0L), 3L, 1L, Some(r(w9, 6)), r(iv9, 6)),
      (Some(1L), 1L, 3L, Some(r(-w9, 6) + 0.0), r(r((2.0 / 6 - 4.0 / 6) * -w9, 9), 6)),
      (None, 4L, 4L, None, ivTot)))
  }

  test("fleissKappa: hand-checked 2-item 3-rater case; constant raters null") {
    // item 1 rated (x,x,y), item 2 (y,y,y): P̄ = 8/12, p = (1/3, 2/3)
    val ratings = Seq((1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "y"), (2L, "y"), (2L, "y")).toDF("i", "j")
    val got = EvalOps.fleissKappa(ratings, col("i"), col("j"), m = 3)
      .orderBy("label")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toList
    def r(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pe = (BigDecimal(r((2.0 / 6) * (2.0 / 6), 9))
      + BigDecimal(r((4.0 / 6) * (4.0 / 6), 9))).toDouble
    val pbar = 8.0 / 12
    val kap = r((pbar - pe) / (1.0 - pe), 6)
    assert(got == List(
      ("ALL", 2L, None, Some(r(pbar, 6)), Some(r(pe, 6)), Some(kap)),
      ("x", 2L, Some(r(2.0 / 6, 6)), None, None, None),
      ("y", 4L, Some(r(4.0 / 6, 6)), None, None, None)))
    // unanimous single category → pe = 1 → kappa undefined
    val const = Seq((1L, "x"), (1L, "x"), (1L, "x")).toDF("i", "j")
    val g2 = EvalOps.fleissKappa(const, col("i"), col("j"), m = 3)
      .filter(col("label") === "ALL")
      .select("pbar", "pe", "kappa")
      .as[(Double, Double, Option[Double])].collect().toList
    assert(g2 == List((1.0, 1.0, None)))
  }

  test("bradleyTerry: 2-item MM hits the analytic 2/3–1/3 fixpoint; zero-win boundary") {
    // a beats b twice, b beats a once → MLE π = (2/3, 1/3); the MM
    // update reaches it in one round and stays (fixpoint is stable
    // under the 9-dp rounding path)
    val duels = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("w", "l")
    val got = EvalOps.bradleyTerry(duels, col("w"), col("l"), rounds = 5)
      .orderBy("item")
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(("a", 3L, 2L, 0.666667), ("b", 3L, 1L, 0.333333)))
    // an item that never wins converges to the MLE boundary π = 0
    val oneway = Seq(("a", "b"), ("a", "b")).toDF("w", "l")
    val g2 = EvalOps.bradleyTerry(oneway, col("w"), col("l"), rounds = 5)
      .orderBy("item")
      .as[(String, Long, Long, Double)].collect().toList
    assert(g2 == List(("a", 2L, 2L, 1.0), ("b", 2L, 0L, 0.0)))
  }

  test("mannWhitneyU: hand-computed tied case and the AUC identity") {
    // g1 = {1, 2}, g2 = {2, 3}: ranks 1, (2.5, 2.5), 4 → 2R1 = 7,
    // 2U1 = 7 − 2·3 = 1; ties Σ(t³−t) = 6;
    // z = (1 − 4) / (2·√(4/12 · (5 − 6/12))) = −3/(2·√1.5) = −1.224745
    val df = Seq((1, 1), (1, 2), (0, 2), (0, 3)).toDF("g", "v")
    val r = EvalOps.mannWhitneyU(df, col("g") === 1, col("v")).head()
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("u1_twice") == 1L)
    assert(r.getAs[Long]("tie_cubes") == 6L)
    assert(r.getAs[Double]("z") == -1.224745)
    // no ties: g1 = {1,2}, g2 = {3,4} → U1 = 0,
    // z = −4/(2·√(4/12·5)) = −1.549193
    val sep = Seq((1, 1), (1, 2), (0, 3), (0, 4)).toDF("g", "v")
    val r2 = EvalOps.mannWhitneyU(sep, col("g") === 1, col("v")).head()
    assert(r2.getAs[Long]("u1_twice") == 0L)
    assert(r2.getAs[Long]("tie_cubes") == 0L)
    assert(r2.getAs[Double]("z") == -1.549193)
    // the rank-sum identity: U1/(n1·n2) = AUC (group1 = positives,
    // value = score) — same frame as the rocAuc tied-case test (8/9)
    val auc = Seq((3, 1), (2, 1), (2, 1), (1, 0), (2, 0), (0, 0))
      .toDF("score", "y")
    val u = EvalOps.mannWhitneyU(auc, col("y") === 1, col("score")).head()
    assert(u.getAs[Long]("u1_twice") == 16L) // U1 = 8 = AUC·n1·n2 = (8/9)·9
  }

  test("spearmanCorr: exact monotone = 1, reversed = -1, tied case matches scipy") {
    val mono = Seq((1, 10), (2, 20), (3, 35), (4, 99))
      .map(t => ("g", t._1, t._2)).toDF("g", "x", "y")
    val r = EvalOps.spearmanCorr(mono, col("g"), col("x"), col("y")).head()
    assert(r.getAs[Double]("rho") == 1.0 && r.getAs[Long]("n") == 4L)
    val rev = EvalOps.spearmanCorr(mono, col("g"), col("x"), lit(-1) * col("y"))
      .head()
    assert(rev.getAs[Double]("rho") == -1.0)
    // tied case by hand: x ranks [1, 2.5, 2.5, 4], y ranks [1, 3, 2, 4]
    // → cov 4.5, var_x 4.5, var_y 5 → rho = 4.5/√22.5 = 0.948683…
    // (matches scipy.stats.spearmanr([1,2,2,3],[10,30,20,40]))
    val tied = Seq((1, 10), (2, 30), (2, 20), (3, 40)).map(t => ("g", t._1, t._2))
      .toDF("g", "x", "y")
    val rt = EvalOps.spearmanCorr(tied, col("g"), col("x"), col("y")).head()
    assert(math.abs(rt.getAs[Double]("rho") - 4.5 / math.sqrt(22.5)) < 1e-6)
    // zero variance in one marginal -> null rho, not a crash
    val flat = Seq((1, 5), (2, 5), (3, 5)).map(t => ("g", t._1, t._2))
      .toDF("g", "x", "y")
    assert(EvalOps.spearmanCorr(flat, col("g"), col("x"), col("y"))
      .head().isNullAt(2))
  }

  test("anovaF matches the hand-computed two-group case") {
    // groups a = {1,2,3}, b = {5,6,7}: means 2 and 6, grand 4
    // SSB = 3·(2-4)² + 3·(6-4)² = 24; SSW = 2 + 2 = 4
    // F = (24/1)/(4/4) = 24; eta² = 24/28
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 5), ("b", 6), ("b", 7))
      .toDF("g", "v")
    val r = EvalOps.anovaF(df, col("g"), col("v")).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("ss_between") == 24.0)
    assert(r.getAs[Double]("ss_within") == 4.0)
    assert(r.getAs[Double]("f_stat") == 24.0)
    assert(math.abs(r.getAs[Double]("eta_sq") - 24.0 / 28.0) < 1e-6)
    assert(r.getAs[Boolean]("significant"))
  }

  test("fdrBh reproduces the textbook BH ladder and clamps at 1") {
    // p = [0.01, 0.02, 0.03, 0.9], m = 4:
    // raw p·m/i = [0.04, 0.04, 0.04, 0.9]; suffix-min = same (monotone)
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.9))
      .toDF("id", "p")
    val out = EvalOps.fdrBh(df, col("id"), col("p")).orderBy("rank")
      .collect()
    assert(out.map(_.getAs[Double]("p_adj")).toSeq ==
      Seq(0.04, 0.04, 0.04, 0.9))
    assert(out.map(_.getAs[Boolean]("reject")).toSeq ==
      Seq(true, true, true, false))
    // non-monotone raw terms: p = [0.04, 0.05], m = 2 →
    // terms [0.08, 0.05]; suffix-min makes adj_1 = 0.05 too
    val nm = Seq(("a", 0.04), ("b", 0.05)).toDF("id", "p")
    val adj = EvalOps.fdrBh(nm, col("id"), col("p")).orderBy("rank")
      .collect().map(_.getAs[Double]("p_adj")).toSeq
    assert(adj == Seq(0.05, 0.05))
    // a rank-1 term over 1 (0.6·2/1 = 1.2) is absorbed by the
    // suffix-min, which always includes p_(m) ≤ 1 — the explicit
    // clamp is belt-and-braces, unreachable on valid p's
    val big = Seq(("a", 0.6), ("b", 0.9)).toDF("id", "p")
    assert(EvalOps.fdrBh(big, col("id"), col("p")).orderBy("rank")
      .collect().map(_.getAs[Double]("p_adj")).toSeq == Seq(0.9, 0.9))
  }

  test("isotonicCalibration: equals sequential pool-adjacent-violators; monotone") {
    // classic violator case: rates 0, 1, 0 per score → PAV merges
    // scores 2-3 into a 0.5 pool: iso = 0, 0.5, 0.5
    val df = Seq((1L, false), (2L, true), (3L, false)).toDF("s", "y")
    val got = EvalOps.isotonicCalibration(df, col("s"), col("y"))
      .orderBy("s").select("s", "n", "y_pos", "rate", "iso")
      .as[(Long, Long, Long, Double, Double)].collect().toList
    assert(got == List((1L, 1L, 0L, 0.0, 0.0),
      (2L, 1L, 1L, 1.0, 0.5), (3L, 1L, 0L, 0.0, 0.5)))
    // cross-check vs the textbook sequential weighted-PAV stack on a
    // deterministic pseudo-random 20-score grid with uneven masses
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).flatMap { s =>
      val w = 1 + rnd.nextInt(5)
      (0 until w).map(_ => (s.toLong, rnd.nextBoolean()))
    }
    val grid = rows.toDF("s", "y")
    val minimax = EvalOps.isotonicCalibration(grid, col("s"), col("y"))
      .orderBy("s").select("s", "iso").as[(Long, Double)].collect().toList
    // sequential PAV: merge adjacent pools while the left mean exceeds
    // the right mean
    case class Pool(sMin: Long, w: Long, y: Long) {
      def mean: Double = y.toDouble / w.toDouble
    }
    val byS = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, rs) =>
      Pool(s, rs.size.toLong, rs.count(_._2).toLong)
    }
    val stack = scala.collection.mutable.Stack.empty[Pool]
    byS.foreach { p =>
      var cur = p
      while (stack.nonEmpty && stack.top.mean >= cur.mean) {
        val t = stack.pop()
        cur = Pool(t.sMin, t.w + cur.w, t.y + cur.y)
      }
      stack.push(cur)
    }
    val pools = stack.toList.reverse
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seqFit = minimax.map(_._1).map { s =>
      r6(pools.filter(_.sMin <= s).last.mean)
    }
    assert(minimax.map(_._2) == seqFit)
    // the PAV guarantee: published fit is nondecreasing in s
    assert(minimax.map(_._2) == minimax.map(_._2).sorted)
  }

  test("labelShiftBbse: exact recovery under proportional shift; singular confusion nulls") {
    // source: 50 pos (40 pred+, 10 pred−), 50 neg (5 pred+, 45 pred−)
    // target: 80/20 mix with the same class-conditional confusion →
    // BBSE recovers w = (1.6, 0.4), π = (0.8, 0.2) EXACTLY
    def rows(n: Int, p: Boolean, t: Boolean, src: Boolean) =
      Seq.fill(n)((p, t, src))
    val df = (rows(40, true, true, true) ++ rows(10, false, true, true)
      ++ rows(5, true, false, true) ++ rows(45, false, false, true)
      ++ rows(64, true, true, false) ++ rows(16, false, true, false)
      ++ rows(2, true, false, false) ++ rows(18, false, false, false))
      .toDF("p", "t", "src")
    val got = EvalOps.labelShiftBbse(df, col("p"), col("t"), col("src"))
      .orderBy("cls")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toList
    assert(got == List(
      ("neg", 50L, 55L, 34L, Some(0.4), Some(0.2)),
      ("pos", 50L, 45L, 66L, Some(1.6), Some(0.8))))
    // a random (rank-1) confusion is unidentifiable → null estimates
    val sing = (rows(10, true, true, true) ++ rows(10, true, false, true)
      ++ rows(10, false, true, true) ++ rows(10, false, false, true)
      ++ rows(7, true, true, false) ++ rows(3, false, false, false))
      .toDF("p", "t", "src")
    val g2 = EvalOps.labelShiftBbse(sing, col("p"), col("t"), col("src"))
      .select("w", "pi_target")
      .as[(Option[Double], Option[Double])].collect().toList
    assert(g2 == List((None, None), (None, None)))
  }

  test("mcnemar: hand-checked discordant cells; no-discordance publishes null") {
    // a/b: TT×4, FF×2, TF×3, FT×1 → chi2 = (3−1)²/(3+1) = 1.0
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(2)((false, false))
      ++ Seq.fill(3)((true, false)) ++ Seq((false, true)))
      .toDF("a", "b")
    val got = EvalOps.mcnemar(df, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().toList
    assert(got == List((10L, 4L, 2L, 3L, 1L, Some(1.0), Some(false))))
    // strongly one-sided discordance crosses the 3.841 threshold
    val sig = (Seq.fill(8)((true, false)) ++ Seq((false, true)))
      .toDF("a", "b")
    val g2 = EvalOps.mcnemar(sig, col("a"), col("b"))
      .select("chi2", "significant")
      .as[(Option[Double], Option[Boolean])].collect().toList
    // (8−1)²/9 = 49/9
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(g2 == List((Some(r6(49.0 / 9)), Some(true))))
    // perfectly concordant raters: no information → null chi2
    val g3 = EvalOps.mcnemar(
        Seq((true, true), (false, false)).toDF("a", "b"),
        col("a"), col("b"))
      .select("chi2", "significant")
      .as[(Option[Double], Option[Boolean])].collect().toList
    assert(g3 == List((None, None)))
  }

  test("krippendorffAlpha: ragged hand-checked case; unpaired items drop; degenerate null") {
    // i1 (a,a): dis 0 · i2 (a,b): dis 2 · i3 (b,b,b): dis 0 · i4 (a): dropped
    // n = 7, do_mass = 2, n_a = 3, n_b = 4, n²−Σn𝒸² = 49−25 = 24
    // alpha = 1 − 6·2/24 = 0.5
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"), (4L, "a")).toDF("i", "j")
    val got = EvalOps.krippendorffAlpha(df, col("i"), col("j"))
      .orderBy("label")
      .as[(String, Long, Option[Double], Option[Double])].collect().toList
    assert(got == List(
      ("ALL", 7L, Some(2.0), Some(0.5)),
      ("a", 3L, None, None),     // i4's lone 'a' rating excluded
      ("b", 4L, None, None)))
    // every rating one category → expected disagreement 0 → null alpha
    val const = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a")).toDF("i", "j")
    val g2 = EvalOps.krippendorffAlpha(const, col("i"), col("j"))
      .filter(col("label") === "ALL")
      .select("do_mass", "alpha")
      .as[(Option[Double], Option[Double])].collect().toList
    assert(g2 == List((Some(0.0), None)))
    // constant-m frame agrees with the closed-form check: perfect
    // agreement → alpha exactly 1
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")).toDF("i", "j")
    val g3 = EvalOps.krippendorffAlpha(perfect, col("i"), col("j"))
      .filter(col("label") === "ALL").select("alpha")
      .as[Option[Double]].collect().toList
    assert(g3 == List(Some(1.0)))
  }

  test("cupedAdjust: hand moments, exact rational means, pooled theta/rho2") {
    // per-unit (x, y): u1 (2,10) u2 (4,14) u3 (6,18) u4 (8,26)
    // n=4 sx=20 sy=68 sxx=120 sxy=392 syy=1296
    // varP=80 covP=208 varY=560 → theta=2.6, theta2=0.371429,
    // rho2 = round(2.6·0.371429, 6) = 0.965715 (true ρ²≈0.9657143)
    // arm0 (u2,u4): meanY=20, cuped=(40·320−208·(48−40))/640 = 17.4
    // arm1 (u1,u3): meanY=14, cuped=(28·320+208·8)/640 = 16.6
    // invariant: arm cuped means average back to the pooled mean 17
    val ev = Seq(
      (1L, 0L, 2.0), (1L, 1L, 10.0), (2L, 2L, 4.0), (2L, 3L, 14.0),
      (3L, 4L, 6.0), (3L, 5L, 18.0), (4L, 6L, 8.0), (4L, 7L, 26.0))
      .toDF("u", "id", "v")
    val got = EvalOps.cupedAdjust(ev, col("u"), col("v"),
        pmod(col("id"), lit(2L)) === 0)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toList
    assert(got == List(
      (0L, 2L, 20.0, 17.4, 2.6, 0.965715),
      (1L, 2L, 14.0, 16.6, 2.6, 0.965715)))
    // zero pre-covariate variance → theta/cuped NULL, raw mean intact
    val flat = Seq((1L, 0L, 5.0), (1L, 1L, 7.0), (2L, 2L, 5.0), (2L, 3L, 9.0))
      .toDF("u", "id", "v")
    val g2 = EvalOps.cupedAdjust(flat, col("u"), col("v"),
        pmod(col("id"), lit(2L)) === 0)
      .select("mean_y", "mean_y_cuped", "theta")
      .as[(Double, Option[Double], Option[Double])].collect().toList
    assert(g2 == List((9.0, None, None), (7.0, None, None)))
  }

  test("diffInDiff: planted effect 5 survives baseline gap + common trend; exact t") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // treated (odd unit) baseline 12, control 10; common post trend
    // +3; planted treatment effect +5. Days 0..3 → cut = 2. Each
    // cell carries two values mean±1 so every cell variance is
    // exactly 2 → se2 = 4, t = 5/2.
    val ev = Seq(
      (1L, t(0), 11L), (1L, t(1), 13L), // T pre  (mean 12)
      (1L, t(2), 19L), (1L, t(3), 21L), // T post (mean 20)
      (2L, t(0), 9L), (2L, t(1), 11L),  // C pre  (mean 10)
      (2L, t(2), 12L), (2L, t(3), 14L)  // C post (mean 13)
    ).map { case (u, ts0, v) => ("g", u, ts0, v) }
      .toDF("grp0", "u", "ts", "v")
    val got = EvalOps.diffInDiff(ev, col("grp0"), col("u"), col("ts"),
        col("v"))
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double],
        Boolean)].head()
    assert(got == (("g", 2L, 2L, 2L, 2L, Some(5.0), Some(2.5), true)))
    // a cell with n = 1 nulls the inference but keeps the estimate
    val thin = ev.filter(col("v") =!= 13L)
    val g2 = EvalOps.diffInDiff(thin, col("grp0"), col("u"), col("ts"),
        col("v"))
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double],
        Boolean)].head()
    assert(g2._2 == 1L && g2._6.isDefined && g2._7.isEmpty && !g2._8)
  }

  test("kendallTauB: tied hand case tau = 0.5 exactly; monotone = 1; flat margin nulls") {
    // points (1,1),(1,2),(2,1),(2,2),(3,3): C = 5, D = 1, one tie
    // pair per margin → τ_b = 2·4/√(16·16) = 0.5 exactly
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 3))
      .toDF("x", "y").withColumn("g", lit("g"))
    val got = EvalOps.kendallTauB(df, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].head()
    assert(got == (("g", 5L, 5L, 1L, Some(0.5))))
    // perfectly concordant untied → 1.0
    val mono = Seq((1, 10), (2, 20), (3, 30)).toDF("x", "y")
      .withColumn("g", lit("g"))
    assert(EvalOps.kendallTauB(mono, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].head()._5 == Some(1.0))
    // a constant margin (all x equal) → zero denominator → null
    val flat = Seq((7, 1), (7, 2), (7, 3)).toDF("x", "y")
      .withColumn("g", lit("g"))
    assert(EvalOps.kendallTauB(flat, col("g"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Option[Double])].head()._5.isEmpty)
  }

  test("hillTailIndex: hand order statistics H = ln 4 exactly; small group dropped") {
    import graft.operators.DataQualityOps
    // 10 head keys at f = 8 over reference x₍₁₁₎ = 2: every ln ratio
    // is ln 4 → H = 1.386294, α = 1/H = 0.721348 on the nano lanes
    val g = (1 to 10).flatMap(u => Seq.fill(8)(("g", u.toLong))) ++
      Seq.fill(2)(("g", 11L)) ++
      (1 to 3).flatMap(u => Seq.fill(2)(("tiny", u.toLong)))
    val got = DataQualityOps.hillTailIndex(g.toDF("grp0", "u"),
        col("grp0"), col("u"), k = 10)
      .as[(String, Long, Long, Double, Option[Double])].collect().toList
    // the 3-key "tiny" group has no x₍₁₁₎ → dropped
    assert(got == List(("g", 10L, 2L, 1.386294, Some(0.721348))))
  }

  test("poissonBootstrapCI: constant population collapses the CI exactly; CI brackets the mean") {
    // every unit carries value 3 → each replicate mean is EXACTLY 3
    // whatever the resample counts — ci_lo = mean = ci_hi = 3.0
    val const = (1 to 50).flatMap(u => Seq(("g", u.toLong, 3L), ("g", u.toLong, 3L)))
      .toDF("grp0", "u", "v")
    val gc = EvalOps.poissonBootstrapCI(const, col("grp0"), col("u"), col("v"))
      .as[(String, Long, Double, Option[Double], Option[Double])].head()
    assert(gc == (("g", 50L, 3.0, Some(3.0), Some(3.0))))
    // heterogeneous: CI must bracket the mean with nonzero width
    val het = (1 to 60).map(u => ("g", u.toLong, (u % 10).toLong))
      .toDF("grp0", "u", "v")
    val gh = EvalOps.poissonBootstrapCI(het, col("grp0"), col("u"), col("v"))
      .as[(String, Long, Double, Option[Double], Option[Double])].head()
    assert(gh._4.get < gh._3 && gh._3 < gh._5.get)
    assert(gh._5.get - gh._4.get < 4.0) // sane width for sd≈2.87, n=60
  }

  test("cmhTest: hand 2-stratum table — chi2 exactly 2.375, MH odds ratio 3.068966") {
    // stratum X: treated 8/2, control 2/8 (strong association);
    // stratum Y: all cells 5 (null). E = 5 + 5, V = 2·10⁴/7600,
    // χ² = (|13 − 10| − ½)²/ΣV = 2.375 exactly on the quantized lanes
    def stratum(st: String, cells: (Int, Int, Int, Int)) = {
      val (a, b, c, d) = cells
      Seq.fill(a)((st, 1L, 1)) ++ Seq.fill(b)((st, 1L, 0)) ++
        Seq.fill(c)((st, 2L, 1)) ++ Seq.fill(d)((st, 2L, 0))
    }
    val df = (stratum("X", (8, 2, 2, 8)) ++ stratum("Y", (5, 5, 5, 5)))
      .toDF("st0", "u", "s")
    val got = EvalOps.cmhTest(df, col("st0"), col("u"), col("s") === 1)
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Boolean)].head()
    assert(got == ((2L, 13L, 10.0, 2.631579, Some(2.375),
      Some(3.068966), false)))
  }

  test("permutationTest: planted extreme effect hits the add-one floor; exact p lattice") {
    // 40 units, odd units all 100, even all 0 — the observed parity
    // split IS the most extreme assignment, so no hash replicate
    // exceeds it: n_exceed = 0, p = 1/64 (the add-one floor)
    val strong = (1 to 40).map(u => ("g", u.toLong, if (u % 2 == 1) 100L else 0L))
      .toDF("grp0", "u", "v")
    val got = EvalOps.permutationTest(strong, col("grp0"), col("u"), col("v"))
      .as[(String, Long, Option[Double], Long, Option[Double])].head()
    assert(got == (("g", 40L, Some(100.0), 0L, Some(0.015625))))
    // p always sits on the (k+1)/64 lattice — exactness means the
    // published value is a fraction with denominator 64, never noise
    assert((got._5.get * 64).isWhole)
  }

  test("ebShrink: small-n key shrinks toward the population mean; degenerate prior nulls") {
    def rows(k: String, n: Int, x: Int) =
      (Seq.fill(x)((k, 1)) ++ Seq.fill(n - x)((k, 0)))
    val df = (rows("a", 100, 30) ++ rows("b", 100, 40) ++
      rows("c", 100, 50) ++ rows("d", 4, 2)).toDF("k", "s")
    val got = EvalOps.ebShrink(df, col("k"), col("s") === 1)
      .orderBy("key")
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().toList
    // pinned doubles of the exact MoM dag (m1 = 0.425, tot = 25.659…):
    // d (2/4) shrinks 0.5 → 0.435115 while c (50/100) barely moves to
    // 0.484685 — the posterior ranks c ABOVE d despite equal p̂
    assert(got == List(
      ("a", 100L, 30L, 0.3, Some(0.325525), Some(10.905114), Some(14.753977)),
      ("b", 100L, 40L, 0.4, Some(0.405105), Some(10.905114), Some(14.753977)),
      ("c", 100L, 50L, 0.5, Some(0.484685), Some(10.905114), Some(14.753977)),
      ("d", 4L, 2L, 0.5, Some(0.435115), Some(10.905114), Some(14.753977))))
    // three extreme rates (0.95, 0.05, 1/1) are MORE dispersed than
    // any Bernoulli mixture a Beta prior explains → tot < 0 → nulls
    val deg = (rows("a", 100, 95) ++ rows("b", 100, 5) ++ rows("c", 1, 1))
      .toDF("k", "s")
    val g2 = EvalOps.ebShrink(deg, col("k"), col("s") === 1)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[Double])].collect().toList
    assert(g2.forall(r => r._5.isEmpty && r._6.isEmpty && r._7.isEmpty))
  }

  test("wilsonLowerBound: 95/100 outranks 1/1 (the average-rating trap); exact dag") {
    val df = (Seq.fill(95)(("big", 1)) ++ Seq.fill(5)(("big", 0)) ++
      Seq(("tiny", 1))).toDF("k", "s")
    val got = EvalOps.wilsonLowerBound(df, col("k"), col("s") === 1)
      .orderBy(desc("wilson_lb"))
      .as[(String, Long, Long, Double, Double)].collect().toList
    // raw doubles of the pinned IEEE dag (z = 1.96): the 100%-but-n=1
    // key shrinks BELOW the 95%-at-n=100 key
    assert(got == List(
      ("big", 100L, 95L, 0.95, 0.8882480347279117),
      ("tiny", 1L, 1L, 1.0, 0.20654329147389294)))
  }
}
