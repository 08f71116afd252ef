package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: empty relations, null/empty text, and
  * groups that fail every filter must yield empty/safe results, never
  * exceptions — at 100 TB some partition somewhere WILL be degenerate.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docsOf(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2))),
      docSchema)

  test("empty documents: every text/dedup operator returns empty, no crash") {
    val empty = docsOf(Seq.empty)
    assert(DedupOps.exactDedup(empty).isEmpty)
    assert(DedupOps.ngramJaccardPairs(empty).isEmpty)
    assert(DedupOps.verifiedNearDups(empty).isEmpty)
    assert(DedupOps.simhash(empty).isEmpty)
    assert(TextAnalysisOps.fingerprints(empty).isEmpty)
    assert(TextOps.topKWords(empty, 10).isEmpty)
    assert(TextOps.heavyHitters(empty).isEmpty) // NULL sketch path, no NPE
  }

  test("temporal ops on empty sides are empty or all-null, never throw") {
    import spark.implicits._
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      .toDF("k", "ts", "x")
    val emptyRight = left.filter(org.apache.spark.sql.functions.lit(false))
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("x").as("v"))
    val j = graft.operators.TemporalOps.asOfJoin(left, emptyRight, Seq("k"), "ts", Seq("v"))
    assert(j.count() == 1 && j.select("asof_v").head().isNullAt(0))
    val emptyIv = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("w_id", "w_start", "w_end")
    assert(graft.operators.TemporalOps
      .rangeJoinPoints(left, "ts", emptyIv, "w_start", "w_end", 3600L * 1000000L).isEmpty)
  }

  test("null and empty text rows are dropped or scored, never throw") {
    val docs = docsOf(Seq(1L -> null, 2L -> "", 3L -> "   ", 4L -> "real text here we go"))
    // shingling drops null/too-short docs
    val sh = DedupOps.shingled(docs, 3).select("doc_id").as[Long].collect()
    assert(sh.toSeq == Seq(4L))
    // language id labels null/empty as "und" rather than dropping
    val langs = TextAnalysisOps.langId(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(langs.keySet == Set(1L, 2L, 3L, 4L))
    assert(langs(1L) == "und" && langs(2L) == "und")
    // token counting survives null text (null-safe lengths)
    val toks = TextAnalysisOps.tokenCounts(docs).where($"doc_id" === 2L)
      .select("bpe_tokens").as[Long].collect()
    assert(toks.toSeq == Seq(0L))
  }

  test("CF on ratings where nothing passes support filters is empty, not an error") {
    val tiny = Seq((1L, 1L, 5L), (2L, 1L, 3L), (1L, 2L, 4L))
      .toDF("user_id", "item_id", "rating")
    assert(CFOps.supportFiltered(tiny).isEmpty)
    assert(CFOps.recommend(tiny, Seq(1L)).isEmpty)
  }

  test("similarity search with an empty query set is empty") {
    val emb = Tables.embeddings(spark, sf0)
    assert(SimilarityOps.bruteForceTopK(emb, lit(false), 5).isEmpty)
    assert(SimilarityOps.annTopK(emb, lit(false), 5).isEmpty)
  }

  test("dedupLast on a single-row group and on all-identical keys") {
    val df = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 5L))
      .toDF("k", "v", "ord")
    val out = RelationalOps.dedupLast(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "b", 20L), (2L, "c", 5L)))
  }

  test("salted CF support hatch: bit-identical to window form, bounded per-task reads under an 80%-hot key") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // Zipf head: item 1 holds 80% of all ratings (the CFOpsSpec
    // dominant-key corpus). Window form puts its whole frame in one
    // task; the saltedSupport hatch must (a) reproduce the window
    // form's output exactly and (b) keep every post-exchange task's
    // shuffle read far below the hot key's cardinality.
    val hot = (1L to 2000L).map(u => (u, 1L, (u % 5) + 1))
    val cold = (1L to 100L).flatMap(u => Seq((u, 2L, 3L), (u, 3L, (u % 2) + 3)))
    val tiny = Seq((1L, 4L, 5L))
    val r = (hot ++ cold ++ tiny).toDF("user_id", "item_id", "rating")
      .repartition(8)
    val base = CFOps.Params(minUsersPerItem = 25, minItemsPerUser = 1)
    val salted = base.copy(saltedSupport = true, supportSalts = 8)

    def run(p: CFOps.Params): (Set[(Long, Long, Long, Double)], Long) = {
      val maxRead = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val rec = te.taskMetrics.shuffleReadMetrics.recordsRead
          maxRead.getAndUpdate(m => math.max(m, rec))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // AQE's small-partition coalescing folds this tiny corpus's whole
      // shuffle output into ONE task, which would read as a hot-key
      // frame; disable it so per-task reads measure KEY placement (the
      // thing the hatch changes), not tiny-data packing
      val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
      val prev = spark.conf.getOption(coalesceKey)
      spark.conf.set(coalesceKey, "false")
      try {
        val rows = CFOps.meanCentered(CFOps.supportFiltered(r, p), p)
          .select("user_id", "item_id", "rating", "rc")
          .as[(Long, Long, Long, Double)].collect().toSet
        // the listener bus is async with no public flush — poll until
        // the max is quiescent (unchanged for 250 ms, 10 s deadline)
        // instead of a fixed sleep: race-free under CI load and ~1 s
        // faster per run on a quiet box
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        var last = maxRead.get
        var stableSince = System.nanoTime()
        while (System.nanoTime() < deadline &&
            System.nanoTime() - stableSince < 250L * 1000 * 1000) {
          Thread.sleep(25)
          val cur = maxRead.get
          if (cur != last) { last = cur; stableSince = System.nanoTime() }
        }
        (rows, maxRead.get)
      } finally {
        prev match {
          case Some(v) => spark.conf.set(coalesceKey, v)
          case None => spark.conf.unset(coalesceKey)
        }
        spark.sparkContext.removeSparkListener(listener)
      }
    }

    val (winRows, winMax) = run(base)
    val (saltRows, saltMax) = run(salted)
    // (a) the flag changes the plan, never a bit of output (integer
    // ratings → both mean forms exact)
    assert(saltRows == winRows && winRows.nonEmpty)
    // (b) window form shuffles the hot item's full 2000-row frame into
    // one task; under the hatch no task ever shuffle-reads more than
    // the salted partials + the (broadcast or skew-splittable)
    // join-back probe side — far below the hot-key cardinality
    assert(winMax >= 2000L, s"window-form max per-task read $winMax")
    assert(saltMax < 1000L, s"salted-form max per-task read $saltMax")
  }

  test("round-3 ops on empty or degenerate inputs never throw") {
    import graft.operators.{DedupOps, RelationalOps, TextAnalysisOps}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // weighted sample: empty frame and zero rows below k
    assert(RelationalOps.weightedSampleExact(
      emptyDocs, col("doc_id"), lit(1L), 5, "s").count() == 0)
    // repetition stats: empty input and all-too-short docs both empty
    assert(TextAnalysisOps.repetitionStats(emptyDocs).count() == 0)
    assert(TextAnalysisOps.repetitionStats(
      Seq((1L, "one")).toDF("doc_id", "text")).count() == 0)
    // decontamination: empty eval set → no pairs; empty train → no pairs
    assert(DedupOps.contaminatedPairs(docs, emptyDocs).count() == 0)
    assert(DedupOps.contaminatedPairs(emptyDocs, docs).count() == 0)
  }

  test("round-7 session-4 ops on empty or degenerate inputs never throw") {
    import graft.operators.{ClusterOps, DataQualityOps, DedupOps, EvalOps,
      GraphOps, RegressionOps, RelationalOps, TemporalOps, TextOps}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // pigeonhole pairs on an empty / singleton corpus
    assert(DedupOps.simhashPairs(emptyDocs).count() == 0)
    assert(DedupOps.simhashPairs(
      Seq((1L, "alpha beta")).toDF("doc_id", "text")).count() == 0)
    // k-core on an empty edge list; on a graph peeled to nothing
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.kCore(noEdges, 2, 3).count() == 0)
    assert(GraphOps.kCore(Seq((1L, 2L)).toDF("src", "dst"), 5, 3).count() == 0)
    // link prediction with no wedges
    assert(GraphOps.linkPrediction(Seq((1L, 2L)).toDF("src", "dst")).count() == 0)
    // MI / co-occurrence on empty docs
    val emptyLang = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(TextOps.tokenLabelMi(emptyLang).count() == 0)
    assert(TextOps.windowedCooccur(emptyDocs).count() == 0)
    // single-token docs generate no pairs
    assert(TextOps.windowedCooccur(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), minCount = 1).count() == 0)
    // kAnonymize on empty input: no rows, including no ANY bucket
    assert(DataQualityOps.kAnonymize(
      Seq.empty[(Int, String)].toDF("a", "b"), col("a"), col("b"), 3).count() == 0)
    // ALS on empty ratings
    assert(graft.operators.CFOps.alsUserFactors(
      Seq.empty[(Long, Long, Long)].toDF("user_id", "item_id", "rating")).count() == 0)
    // stump where label never varies: scores still defined (0.0)
    val pure = RegressionOps.giniStump(
      Seq((1L, true), (2L, true)).toDF("x", "y"), col("x"), col("y"))
      .as[(Long, Long, Long, Long, Long, Double, Int)].collect()
    assert(pure.forall(_._6 == 0.0))
    // confusion on empty scores
    assert(EvalOps.confusionReport(
      Seq.empty[(String, String)].toDF("t", "p"), col("t"), col("p")).count() == 0)
    // grid density with minPts greater than any cell: all noise
    val emb = Seq((1L, Array(0.1f, 0.1f)), (2L, Array(0.2f, 0.2f)))
      .toDF("vec_id", "embedding")
    val gd = ClusterOps.gridDensityClusters(emb, eps = 1.0, minPts = 10)
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(gd.length == 2 && gd.forall(_._4.isEmpty))
    // attribution with zero conversions / empty events
    val noConv = Seq((1L, new java.sql.Timestamp(0L), "click", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    assert(TemporalOps.lastTouchAttribution(noConv, "purchase",
      Seq("click"), 1000000L).count() == 0)
    // RFM on a single customer: every score is 1 of 1 bucket
    val one = Seq((7L, new java.sql.Timestamp(0L), 5.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = RelationalOps.rfmSegments(one).select("segment")
      .as[String].collect()
    assert(r.sameElements(Array("111")))
  }

  test("round-8 session-6 ops on empty or degenerate inputs never throw") {
    import graft.operators.{DedupOps, EvalOps, SketchOps, TemporalOps, TextOps}
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val emptyEv = Seq.empty[(String, java.sql.Timestamp, Long, Double)]
      .toDF("event_type", "ts", "user_id", "value")
    val oneEv = Seq(("a", ts(10), 1L, 5.0))
      .toDF("event_type", "ts", "user_id", "value")
    val grid = expr("CAST(floor(value * 10) AS BIGINT)")
    // time-series family: empty → empty; single observation → the
    // degenerate row (no pairs/lags), never a crash
    assert(TemporalOps.acf(emptyEv, col("event_type"), col("ts"), grid)
      .count() == 0)
    assert(TemporalOps.acf(oneEv, col("event_type"), col("ts"), grid)
      .count() == 0) // one day → no lag pairs
    assert(TemporalOps.trendRobust(emptyEv, col("event_type"), col("ts"),
      grid).count() == 0)
    val tr1 = TemporalOps.trendRobust(oneEv, col("event_type"), col("ts"),
        grid).as[(String, Long, Long, Option[Double], Option[Double])].head()
    assert(tr1 == (("a", 1L, 0L, None, None)))
    assert(TemporalOps.ljungBox(emptyEv, col("event_type"), col("ts"),
      grid).count() == 0)
    assert(TemporalOps.stationaryDistribution(emptyEv, Seq("user_id"),
      "ts", "event_type", "value").count() == 0)
    // a single event has no transitions → empty chain
    assert(TemporalOps.stationaryDistribution(oneEv, Seq("user_id"),
      "ts", "event_type", "value").count() == 0)
    // a mass-losing kernel (the only transition targets a clipped
    // to-only state) publishes ZEROS — the oracle's convention
    val lossy = Seq(("A", ts(1), 1L, 1.0), ("Z", ts(2), 1L, 1.0))
      .toDF("event_type", "ts", "user_id", "value")
    val gl = TemporalOps.stationaryDistribution(lossy, Seq("user_id"),
        "ts", "event_type", "value")
      .as[(String, Long, Double)].collect().toList
    assert(gl == List(("A", 0L, 0.0)))
    // log-rank is a global aggregate: empty input → ONE degenerate
    // row (0 units per arm, null inference), not an empty frame
    val lrEmpty = TemporalOps.logRankTest(emptyEv, "user_id", "ts")
      .select("n_treat", "n_ctrl", "z", "significant")
      .as[(Long, Long, Option[Double], Boolean)].head()
    assert(lrEmpty == ((0L, 0L, None, false)))
    // stats family: empty → empty; all-one-arm → null inference
    assert(EvalOps.diffInDiff(emptyEv, col("event_type"), col("user_id"),
      col("ts"), grid).count() == 0)
    val didOneArm = EvalOps.diffInDiff(
        Seq(("a", ts(0), 2L, 1.0), ("a", ts(86400 * 9), 2L, 2.0))
          .toDF("event_type", "ts", "user_id", "value"),
        col("event_type"), col("user_id"), col("ts"), grid)
      .select("did", "t_did").as[(Option[Double], Option[Double])].head()
    assert(didOneArm == ((None, None)))
    assert(EvalOps.permutationTest(emptyEv, col("event_type"),
      col("user_id"), grid).count() == 0)
    assert(EvalOps.cmhTest(emptyEv, col("event_type"), col("user_id"),
      col("value") > 1).count() == 1) // single all-zero row, null stats
    assert(EvalOps.kendallTauB(emptyEv, col("event_type"),
      expr("CAST(value AS BIGINT)"), col("user_id")).count() == 0)
    assert(EvalOps.wilsonLowerBound(emptyEv, col("event_type"),
      col("value") > 1).count() == 0)
    assert(EvalOps.ebShrink(oneEv, col("event_type"), col("value") > 1)
      .select("p_shrunk").as[Option[Double]].head().isEmpty) // K = 1
    // sketch/text/linkage: empty in, empty (or empty-population) out
    assert(SketchOps.amsF2(emptyEv.select(col("user_id").as("k")), "k")
      .select("exact_f2").as[Option[Long]].head().isEmpty)
    assert(TextOps.chao1Richness(
      Seq.empty[(String, String)].toDF("lang", "text")).count() == 0)
    assert(DedupOps.jaroLinkage(
      Seq.empty[String].toDF("s")).count() == 0)
    assert(DedupOps.jaroLinkage(Seq("solo").toDF("s")).count() == 0)
  }
}
