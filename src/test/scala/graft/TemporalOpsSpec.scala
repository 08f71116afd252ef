package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3")) // no prior right row → null
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0), // equal ts: visible to p1
      (1L, ts("2024-01-01 11:59:00"), 30.0),
      (2L, ts("2024-01-01 09:30:00"), 99.0)) // after p3: not visible
      .toDF("user_id", "ts", "v")
    val got = TemporalOps.asOfJoin(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got("p1").contains(20.0)) // the <= tie, not the 09:30 row
    assert(got("p2").contains(30.0))
    assert(got("p3").isEmpty)
  }

  test("asOfJoin: a matched right row whose value IS null yields null, not a stale value") {
    val left = Seq((1L, ts("2024-01-01 11:00:00"), "p1")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 10:00:00"), None)) // the as-of match, value null
      .toDF("user_id", "ts", "v")
    val got = TemporalOps.asOfJoin(left, right, Seq("user_id"), "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(got.isEmpty) // NOT the stale 5.0 — matches DuckDB ASOF semantics
  }

  test("rangeJoinPoints equals the naive inequality join, without a nested loop") {
    val ev = Tables.events(spark, sf0).select("event_id", "ts")
    val hourUs = 3600L * 1000000L
    val baseUs = 1704067200000000L
    val windows = (0L until 10L).map { w =>
      (w, baseUs + w * 36 * hourUs, baseUs + w * 36 * hourUs + 48 * hourUs)
    }.toDF("w_id", "su", "eu")
      .select(col("w_id"), timestamp_micros(col("su")).as("w_start"),
        timestamp_micros(col("eu")).as("w_end"))
    val bucketed = TemporalOps.rangeJoinPoints(ev, "ts", windows, "w_start", "w_end", 48 * hourUs)
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    val naive = ev.join(windows, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "w_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
    // overlapping windows really overlap: some event is in 2 windows
    assert(bucketed.groupBy(_._1).exists(_._2.size >= 2))
    // and the plan is an equi-join on the bucket, not a nested loop
    val plan = TemporalOps.rangeJoinPoints(ev, "ts", windows, "w_start", "w_end", 48 * hourUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("asOfJoin: null-timestamp right rows never match (SQL <= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "p1")).toDF("k", "ts", "tag")
    val right = Seq((1L, None: Option[java.sql.Timestamp], 9.0))
      .toDF("k", "ts", "v")
    val got = TemporalOps.asOfJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(got.isEmpty) // null ts sorts first in the window but must not match
  }

  test("rangeJoinPoints drops inverted and null-bounded intervals instead of crashing") {
    val p = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("p_id", "ts")
    val iv = Seq(
      (10L, Some(ts("2024-01-01 12:00:00")), Some(ts("2024-01-01 10:00:00"))), // inverted
      (11L, None, Some(ts("2024-01-01 12:00:00"))),                             // null lo
      (12L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 12:00:00")))) // valid
      .toDF("w_id", "w_start", "w_end")
    val got = TemporalOps.rangeJoinPoints(p, "ts", iv, "w_start", "w_end", 3600L * 1000000L)
      .select("w_id").as[Long].collect().toSeq
    assert(got == Seq(12L))
  }

  test("sessionize: within-gap AND exact-gap merge; only beyond-gap splits") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:59")), // < 30 min after previous → same session
      (1L, ts("2024-01-01 10:59:59")), // EXACTLY 30:00 after 10:29:59 → still merges
      (1L, ts("2024-01-01 11:29:59")), // EXACTLY 30:00 after → still merges
      (1L, ts("2024-01-01 12:00:00")), // 30:01 after → NEW session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val got = TemporalOps.sessionize(ev, Seq("user_id"), "ts", "30 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 1L), (1L, 4L), (2L, 1L)))
  }

  test("sessionize under Structured Streaming matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val source = MemoryStream[(Long, java.sql.Timestamp)]
    val sdf = source.toDS().toDF("user_id", "ts")
    val q = TemporalOps.sessionize(sdf.withWatermark("ts", "1 hour"),
        Seq("user_id"), "ts", "30 minutes")
      .writeStream.format("memory").queryName("sessionize_stream_test")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:20:00")),
      (1L, ts("2024-01-01 11:30:00")), (2L, ts("2024-01-01 10:05:00")))
    source.addData(rows: _*)
    q.processAllAvailable()
    // advance the watermark far enough to close and emit all sessions
    source.addData((99L, ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    val streamed = spark.table("sessionize_stream_test")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    q.stop()
    val batch = TemporalOps.sessionize(rows.toDF("user_id", "ts"),
        Seq("user_id"), "ts", "30 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("asOfJoin with a composite key never matches across key boundaries") {
    val left = Seq((1L, "a", ts("2024-01-01 12:00:00"), "p1"),
      (1L, "b", ts("2024-01-01 12:00:00"), "p2"))
      .toDF("k1", "k2", "ts", "tag")
    val right = Seq((1L, "a", ts("2024-01-01 11:00:00"), 7.0))
      .toDF("k1", "k2", "ts", "v")
    val got = TemporalOps.asOfJoin(left, right, Seq("k1", "k2"), "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got("p1").contains(7.0) && got("p2").isEmpty)
  }

  test("asOfJoin keeps every left row exactly once (left-join cardinality)") {
    val ev = Tables.events(spark, sf0)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max(col("value")).as("v"))
    val joined = TemporalOps.asOfJoin(purchases, views, Seq("user_id"), "ts", Seq("v"))
    assert(joined.count() == purchases.count())
  }

  test("fillGaps densifies per-key bucket counts with zeros, span per key") {
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00")), // bucket 0 (6h buckets)
      (1L, ts("2024-01-01 01:20:00")), // bucket 0
      (1L, ts("2024-01-01 19:00:00")), // bucket 3 → gaps at 1, 2
      (2L, ts("2024-01-01 07:00:00"))) // single bucket, no gaps
      .toDF("user_id", "ts")
    val got = TemporalOps.fillGaps(events, Seq("user_id"), "ts")
      .orderBy("user_id", "bucket_us")
      .as[(Long, Long, Long)].collect().toList
    val h6 = 21600000000L
    val day = ts("2024-01-01 00:00:00").getTime / 1000 * 1000000L // local-midnight epoch micros
    val b0 = day / h6
    assert(got == List(
      (1L, b0 * h6, 2L), (1L, (b0 + 1) * h6, 0L),
      (1L, (b0 + 2) * h6, 0L), (1L, (b0 + 3) * h6, 1L),
      (2L, (b0 + 1) * h6, 1L)))
  }

  test("funnel: strict step order, stage = resolved prefix") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      // user 1: full funnel in order
      (1L, t(10), "view"), (1L, t(20), "click"), (1L, t(30), "purchase"),
      // user 2: click BEFORE the first view — step 2 never resolves,
      // and the later purchase must NOT resolve either (strict order)
      (2L, t(10), "click"), (2L, t(20), "view"), (2L, t(30), "purchase"),
      // user 3: view only
      (3L, t(5), "view"),
      // user 4: no view at all — absent from the funnel
      (4L, t(1), "purchase"),
      // user 5: click at the SAME instant as the view counts (>=)
      (5L, t(7), "view"), (5L, t(7), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = TemporalOps.funnel(ev, Seq("user_id"), "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect().toList
    def us(sec: Long) = sec * 1000000L
    assert(got == List(
      (1L, us(10), Some(us(20)), Some(us(30)), 3),
      (2L, us(20), None, None, 1),
      (3L, us(5), None, None, 1),
      (5L, us(7), Some(us(7)), None, 2)))
  }

  test("cohortRetention: epoch-anchored periods, offset-0 self-check") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400 * 1000)
    val ev = Seq(
      // u1: cohort period 0 (day 0), back in periods 1 and 3
      (1L, t(0)), (1L, t(8)), (1L, t(21)),
      // u2: cohort period 0 (day 3), never back
      (2L, t(3)),
      // u3: cohort period 1 (day 9), twice in-period, back in period 2
      (3L, t(9)), (3L, t(10)), (3L, t(16)))
      .toDF("user_id", "ts")
    val got = TemporalOps.cohortRetention(ev, "user_id", "ts", 7)
      .orderBy("cohort", "offset")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (0L, 0L, 2L, 2L), (0L, 1L, 2L, 1L), (0L, 3L, 2L, 1L),
      (1L, 0L, 1L, 1L), (1L, 1L, 1L, 1L)))
  }

  test("rollingAnomaly: cold start nulls, zero-variance nulls, spike fires") {
    // key 1: 1,2,3,4,5,100 — row 6 baseline mean 3, std_pop sqrt(2),
    //   z = (100-3)/1.414214 ≈ 68.59 → anomaly; rows 1-4 cold (n_prior<4);
    //   row 5 has n_prior=4, mean 2.5, std_pop of {1,2,3,4} ≈ 1.118034
    // key 2: constant 7s — zero variance → z null forever
    val rows =
      (1 to 6).map(i => (1L, i.toLong, if (i == 6) 100.0 else i.toDouble)) ++
        (1 to 5).map(i => (2L, i.toLong, 7.0))
    val events = rows.toDF("user_id", "event_id", "v")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
    val got = TemporalOps.rollingAnomaly(events, Seq("user_id"), "ts", "v",
        "event_id")
      .orderBy("user_id", "seq")
      .select("user_id", "seq", "n_prior", "z", "is_anomaly")
      .as[(Long, Int, Long, Option[Double], Boolean)]
      .collect().toList
    val k1 = got.filter(_._1 == 1L)
    assert(k1.take(4).forall(r => r._4.isEmpty && !r._5)) // cold start
    val r5 = k1(4)
    assert(r5._3 == 4L && r5._4.contains(2.2361) && !r5._5)
    val r6 = k1(5)
    assert(r6._3 == 5L && r6._4.exists(_ > 60) && r6._5)
    assert(got.filter(_._1 == 2L).forall(r => r._4.isEmpty && !r._5)) // zero variance
  }

  test("hopWindowStats: every event in exactly window/slide windows, epoch-aligned") {
    // window 10s / slide 5s: event at t belongs to starts 5·(t div 5)
    // and 5·(t div 5 − 1); boundary event t=10 exercises exact-start
    val events = Seq(
      (1L, ts("1970-01-01 00:00:03"), 1.0),
      (2L, ts("1970-01-01 00:00:10"), 2.0),
      (3L, ts("1970-01-01 00:00:12"), 4.0)
    ).toDF("id", "t", "v")
    val got = TemporalOps.hopWindowStats(events, "t", "v",
        windowSeconds = 10, slideSeconds = 5)
      .orderBy("win_start_us")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (-5000000L, 1L, 1.0),          // [-5, 5): t=3
      (0L, 1L, 1.0),                 // [0, 10): t=3 (t=10 excluded!)
      (5000000L, 2L, 6.0),           // [5, 15): t=10, t=12
      (10000000L, 2L, 6.0)))         // [10, 20): t=10, t=12
    // total assignments = 2 per event
    assert(got.map(_._2).sum == 6)
  }

  test("scd2: runs collapse, intervals chain, null attr forms its own runs") {
    // user 1: A A B A — runs A[10:00,10:02) B[10:02,10:03) A[10:03,∞);
    // user 2: null A null — null-safe islands: three runs, null ≠ A
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), Some("A"), 1L),
      (1L, ts("2026-01-01 10:01:00"), Some("A"), 2L), // same run as #1
      (1L, ts("2026-01-01 10:02:00"), Some("B"), 3L),
      (1L, ts("2026-01-01 10:03:00"), Some("A"), 4L), // A again: NEW run
      (2L, ts("2026-01-01 09:00:00"), None, 5L),
      (2L, ts("2026-01-01 09:01:00"), Some("A"), 6L),
      (2L, ts("2026-01-01 09:02:00"), None, 7L)
    ).toDF("user_id", "t", "attr", "event_id")
    val got = TemporalOps.scd2(events, Seq("user_id"), "t", "event_id", "attr")
      .orderBy("user_id", "version")
      .as[(Long, Option[String], java.sql.Timestamp, Long,
        Option[java.sql.Timestamp], Int)]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some("A"), ts("2026-01-01 10:00:00"), 1L,
        Some(ts("2026-01-01 10:02:00")), 1),
      (1L, Some("B"), ts("2026-01-01 10:02:00"), 3L,
        Some(ts("2026-01-01 10:03:00")), 2),
      (1L, Some("A"), ts("2026-01-01 10:03:00"), 4L, None, 3),
      (2L, None, ts("2026-01-01 09:00:00"), 5L,
        Some(ts("2026-01-01 09:01:00")), 1),
      (2L, Some("A"), ts("2026-01-01 09:01:00"), 6L,
        Some(ts("2026-01-01 09:02:00")), 2),
      (2L, None, ts("2026-01-01 09:02:00"), 7L, None, 3)))
    // intervals tile the timeline: each valid_to equals the next
    // version's valid_from within the key
    got.groupBy(_._1).values.foreach { runs =>
      runs.sortBy(_._6).sliding(2).foreach {
        case Seq(a, b) => assert(a._5.contains(b._3))
        case _ => ()
      }
    }
  }

  test("ohlc: open/close follow the (ts, tiebreak) order, buckets epoch-aligned") {
    // bucket = 1 hour. user-less key "A": two buckets; same-ts rows in
    // bucket 1 break the tie on event_id (open = id 1, close = id 2)
    val events = Seq(
      ("A", ts("2026-01-01 10:10:00"), 1L, 5.0),
      ("A", ts("2026-01-01 10:10:00"), 2L, 9.0), // same ts, higher id
      ("A", ts("2026-01-01 10:40:00"), 3L, 1.0),
      ("A", ts("2026-01-01 11:05:00"), 4L, 7.0),
      ("B", ts("2026-01-01 10:30:00"), 5L, 4.0)
    ).toDF("k", "t", "event_id", "value")
    val got = TemporalOps.ohlc(events, Seq("k"), "t", "event_id", "value",
        3600L * 1000000L)
      .orderBy("k", "bucket_us")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().toSeq
    def us(s: String) = ts(s).getTime * 1000L
    assert(got == Seq(
      ("A", us("2026-01-01 10:00:00"), 5.0, 9.0, 1.0, 1.0, 3L),
      ("A", us("2026-01-01 11:00:00"), 7.0, 7.0, 7.0, 7.0, 1L),
      ("B", us("2026-01-01 10:00:00"), 4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("intervalMerge: overlap merges, touching stays separate, keys isolate") {
    // user 1: [0,10) ∪ [5,15) merge; [15,25) touches 15 exactly -> NEW
    // island (half-open); [40,50) gap -> new. user 2: single interval.
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 15L, 25L),
      (1L, 4L, 40L, 50L), (2L, 5L, 0L, 10L)
    ).toDF("user_id", "event_id", "s", "e")
    val got = TemporalOps.intervalMerge(iv, Seq("user_id"), "event_id",
        col("s"), col("e"))
      .orderBy("user_id", "start_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 15L, 2L), (1L, 15L, 25L, 1L), (1L, 40L, 50L, 1L),
      (2L, 0L, 10L, 1L)))
  }

  test("intervalMerge: an early long interval bridges rows a previous-end test would split") {
    // [0,100) swallows [10,20) AND [90,95): row #3 starts after row
    // #2's end (20), so a lag-end island test would wrongly split —
    // only the cummax of ALL previous ends (100) keeps them together
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 90L, 95L)
    ).toDF("user_id", "event_id", "s", "e")
    val got = TemporalOps.intervalMerge(iv, Seq("user_id"), "event_id",
        col("s"), col("e"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 100L, 3L)))
  }

  test("ewma: truncated exponential smoothing matches a hand fold; short history renormalizes") {
    // user 1: values 1,2,4,8 — alpha=1/2, lookback=6 (covers all rows).
    // Row k's ewma = Σ_{j<=k} 2^-j v_{k-j} / Σ_{j<=k} 2^-j, fully exact.
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1.0, 1L),
      (1L, ts("2026-01-01 10:01:00"), 2.0, 2L),
      (1L, ts("2026-01-01 10:02:00"), 4.0, 3L),
      (1L, ts("2026-01-01 10:03:00"), 8.0, 4L)
    ).toDF("user_id", "t", "value", "event_id")
    val got = TemporalOps.ewma(events, Seq("user_id"), "t", "value", "event_id")
      .orderBy("event_id").select("ewma").as[Double].collect().toSeq
    assert(got == Seq(
      1.0,
      (2.0 + 0.5 * 1.0) / 1.5,
      (4.0 + 0.5 * 2.0 + 0.25 * 1.0) / 1.75,
      (8.0 + 0.5 * 4.0 + 0.25 * 2.0 + 0.125 * 1.0) / 1.875))
    // bit-exactness claim: terms are power-of-two scalings, so the first
    // row IS the raw value with no rounding residue at all
    assert(got.head == 1.0)
  }

  test("ewma: horizon truncation drops lags beyond lookback; ties broken by tiebreak col") {
    // 4 rows, lookback=2: row 4 sees only rows 2,3 — row 1's value (1000)
    // must NOT leak in. Rows 2,3 share a ts; event_id orders them.
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1000.0, 1L),
      (1L, ts("2026-01-01 10:01:00"), 2.0, 2L),
      (1L, ts("2026-01-01 10:01:00"), 4.0, 3L), // same ts: id orders after
      (1L, ts("2026-01-01 10:02:00"), 8.0, 4L)
    ).toDF("user_id", "t", "value", "event_id")
    val got = TemporalOps.ewma(events, Seq("user_id"), "t", "value", "event_id",
        alpha = 0.5, lookback = 2)
      .orderBy("event_id").select("ewma").as[Double].collect().toSeq
    assert(got.last == (8.0 + 0.5 * 4.0 + 0.25 * 2.0) / 1.75)
    // non-power-of-two alpha is rejected (exactness contract)
    intercept[IllegalArgumentException] {
      TemporalOps.ewma(events, Seq("user_id"), "t", "value", "event_id",
        alpha = 0.3)
    }
  }

  test("transitionMatrix: tiebreak-ordered lead pairs, row-conditional p") {
    // user 1: A→B→A (with B,A sharing a timestamp — event_id breaks the
    // tie); user 2: A→B only; last events emit no pair
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), "A", 1L),
      (1L, ts("2026-01-01 10:01:00"), "B", 2L),
      (1L, ts("2026-01-01 10:01:00"), "A", 3L), // same ts as B: id orders it after
      (2L, ts("2026-01-01 09:00:00"), "A", 4L),
      (2L, ts("2026-01-01 09:05:00"), "B", 5L)
    ).toDF("user_id", "t", "typ", "event_id")
    val got = TemporalOps.transitionMatrix(events, Seq("user_id"), "t",
        "typ", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 2L, 1.0), ("B", "A", 1L, 1.0)))
  }

  test("purgedTimeFolds: block fold ids, embargo purges edges, certificate arithmetic") {
    // block = 100 s, embargo = 10 s, k = 2; epoch seconds hand-picked
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      (1L, at(5L)),   // off 5s  < embargo → purged
      (2L, at(50L)),  // block 0 → fold 0
      (3L, at(95L)),  // off 95 ≥ 90 → purged
      (4L, at(150L)), // block 1 → fold 1
      (5L, at(250L)), // block 2 → fold 0
      (6L, at(210L))  // off 10 == embargo → KEPT (inclusive lower edge)
    ).toDF("event_id", "t")
    val got = TemporalOps.purgedTimeFolds(events, "t", 2,
        blockUs = 100000000L, embargoUs = 10000000L)
      .select("event_id", "fold").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(0L), 3L -> None,
      4L -> Some(1L), 5L -> Some(0L), 6L -> Some(0L)))
    // kept rows of different folds are ≥ 2·embargo apart by construction
    val kept = events
      .transform(e => TemporalOps.purgedTimeFolds(e, "t", 2, 100000000L, 10000000L))
      .filter(col("fold").isNotNull)
      .select(unix_micros(col("t")).as("us"), col("fold"))
      .as[(Long, Long)].collect()
    for ((ua, fa) <- kept; (ub, fb) <- kept if fa != fb)
      assert(math.abs(ua - ub) >= 2 * 10000000L)
    // degenerate params rejected
    intercept[IllegalArgumentException] {
      TemporalOps.purgedTimeFolds(events, "t", 2, 100L, 60L)
    }
  }

  test("lastTouchAttribution: in-window credit, organic, post-touch ignored, ts ties by id") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq(
      // user 1: click at 0, purchase at 10 -> credited, 10 min
      (1L, ts(0), "click", 100L), (1L, ts(10), "purchase", 101L),
      // user 2: view 2000 min before purchase (> 24h) -> organic
      (2L, ts(0), "view", 200L), (2L, ts(2000), "purchase", 201L),
      // user 3: touch only AFTER the purchase -> organic
      (3L, ts(5), "purchase", 300L), (3L, ts(6), "click", 301L),
      // user 4: same-ts click/view ordered by id; later wins
      (4L, ts(1), "click", 400L), (4L, ts(1), "view", 401L),
      (4L, ts(2), "purchase", 402L),
      // error events never earn credit
      (5L, ts(0), "error", 500L), (5L, ts(1), "purchase", 501L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = TemporalOps.lastTouchAttribution(ev, "purchase",
        Seq("click", "view", "signup"), 24L * 3600 * 1000000)
      .as[(Long, Long, Long, Option[String], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 101L, 10L * 60000000, Some("click"), Some(100L), Some(10L))))
    assert(got(2L)._4.isEmpty && got(2L)._6.isEmpty)
    assert(got(3L)._4.isEmpty)
    assert(got(4L)._4 == Some("view") && got(4L)._5 == Some(401L))
    assert(got(5L)._4.isEmpty)
  }

  test("pathCounts3: adjacent triples only, per-key timelines, support + rank") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // user 1: a b c a b → triples abc, bca, cab; user 2: a b c → abc
    val ev = Seq(
      (1L, t(1), 101L, "a"), (1L, t(2), 102L, "b"), (1L, t(3), 103L, "c"),
      (1L, t(4), 104L, "a"), (1L, t(5), 105L, "b"),
      (2L, t(1), 201L, "a"), (2L, t(2), 202L, "b"), (2L, t(3), 203L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.TemporalOps.pathCounts3(ev, Seq("user_id"),
        "ts", "event_type", "event_id", minSupport = 1)
      .orderBy("rk")
      .as[(String, String, String, Long, Int)].collect().toList
    assert(got == List(
      ("a", "b", "c", 2L, 1),   // crosses no user boundary: u2's abc counts
      ("b", "c", "a", 1L, 2),   // ties broken lexicographically
      ("c", "a", "b", 1L, 3)))
    // support filter drops the singletons
    val g2 = graft.operators.TemporalOps.pathCounts3(ev, Seq("user_id"),
        "ts", "event_type", "event_id", minSupport = 2)
      .as[(String, String, String, Long, Int)].collect().toList
    assert(g2 == List(("a", "b", "c", 2L, 1)))
  }

  test("kmSurvival: hand-checked curve, censoring, and the d=n zero step") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400 * 1000)
    // horizon = day 5; censor gap 1 day ⇒ u3/u4 (last seen day 5)
    // censored, u1 (day 2) and u2 (day 4) are churn events
    val ev = Seq(
      (1L, t(0)), (1L, t(2)),           // lifetime 2 — death
      (2L, t(0)), (2L, t(4)),           // lifetime 4 — death (gap = 1, not < 1)
      (3L, t(3)), (3L, t(5)),           // lifetime 2 — censored
      (4L, t(5)))                       // lifetime 0 — censored
      .toDF("user_id", "ts")
    val got = graft.operators.TemporalOps.kmSurvival(ev,
        censorGapUs = 86400000000L, unitUs = 86400000000L)
      .orderBy("t")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toList
    // t=2: S = 2/3 via the 9-dp ln / exp chain
    def r(v: Double, n: Int) =
      BigDecimal(v).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s2 = r(math.exp(r(math.log(2.0 / 3.0), 9)), 6)
    assert(got == List(
      (0L, 4L, 0L, 1L, 0.0, 1.0),
      (2L, 3L, 1L, 1L, r(1.0 / 3.0, 6), s2),
      (4L, 1L, 1L, 0L, 1.0, 0.0)))   // d = n: curve hits exact zero
  }

  test("seasonalProfile: weekday effect exact; residual peak finds the day that broke its pattern") {
    // 14 days, one obs/day: dow 0 carries 10 then an anomalous 40;
    // all other days 20. T = 290, N = 14.
    // eff(dow0) = 25 − 290/14 = 120/28; eff(other) = −20/28
    // dow0 residuals vs its own mean 25: −15 and +15 (|res| tie →
    // earlier day wins); other dows: 0
    val dayUs = 86400000000L
    val rows = (0L until 14L).map { d =>
      val x = if (d == 0L) 10L else if (d == 7L) 40L else 20L
      ("g", d * dayUs + 3L, x)
    }
    val df = rows.toDF("grp", "us", "x")
      .select(col("grp"), timestamp_micros(col("us")).as("ts"), col("x"))
    val got = TemporalOps.seasonalProfile(df, col("grp"), col("ts"), col("x"))
      .orderBy("dow")
      .select("dow", "n_days", "n", "eff", "peak_day", "peak_res")
      .as[(Long, Long, Long, Double, Long, Double)].collect().toList
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head == ((0L, 2L, 2L, r6(120.0 / 28), 0L, -15.0)))
    got.tail.zipWithIndex.foreach { case ((dow, nd, n, eff, pd, pr), i) =>
      assert(dow == i + 1L && nd == 2L && n == 2L)
      assert(eff == r6(-20.0 / 28) && pd == dow && pr == 0.0)
    }
  }

  test("cusumShift: level shift accumulates via the prefix-min identity; peak flags the excursion max") {
    // one observation per day, grid value 10 on days 0-2 then 20 on
    // days 3-5: T = 90, N = 6 → dev = ±30·(scaled); C walks
    // −30,−60,−90,−60,−30,0 so cusum_pos ramps 0,0,0,30,60,90 after
    // the shift and cusum_neg 0,30,60,30,0,0 before it
    val dayUs = 86400000000L
    val rows = Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 20L),
      (4L, 20L), (5L, 20L))
      .map { case (d, x) => ("g", d * dayUs + 7L, x) }
    val df = rows.toDF("grp", "us", "x")
      .select(col("grp"), timestamp_micros(col("us")).as("ts"), col("x"))
    val got = TemporalOps.cusumShift(df, col("grp"), col("ts"), col("x"))
      .orderBy("day")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toList
    assert(got == List(
      ("g", 0L, 1L, -30L, 0L, 0L, false),
      ("g", 1L, 1L, -30L, 0L, 30L, false),
      ("g", 2L, 1L, -30L, 0L, 60L, false),
      ("g", 3L, 1L, 30L, 30L, 30L, false),
      ("g", 4L, 1L, 30L, 60L, 0L, false),
      ("g", 5L, 1L, 30L, 90L, 0L, true)))
    // no shift → every deviation 0, no spurious excursion; the whole
    // flat group ties at cusum_pos = 0 so every day is "the peak"
    val flat = Seq(0L, 1L, 2L).map(d => ("g", d * dayUs, 10L))
      .toDF("grp", "us", "x")
      .select(col("grp"), timestamp_micros(col("us")).as("ts"), col("x"))
    val g2 = TemporalOps.cusumShift(flat, col("grp"), col("ts"), col("x"))
      .select("dev", "cusum_pos", "cusum_neg", "is_peak")
      .as[(Long, Long, Long, Boolean)].collect().toList
    assert(g2 == List.fill(3)((0L, 0L, 0L, true)))
  }

  test("sequentialPatterns: greedy embeddings, Apriori pruning, exact supports") {
    // 4 users, min support 1/2 → sup ≥ 2. Hand-enumerated:
    //   u1: a b c | u2: b a b c | u3: c b a | u4: a c b
    // L2 survivors: a>b:3 a>c:3 b>a:2 b>c:2 c>b:2 (c>a:1, b>b:1 pruned)
    // L3: only a>b>c (u1; u2 via p1(a)=2,p2(b)=3,c@4) = 2. u4 fails it:
    // greedy p2 = first b AFTER a = pos 3, no c after — and no other
    // embedding exists either (greedy-exactness for existence).
    val ev = (Seq((1L, "a"), (1L, "b"), (1L, "c")).zipWithIndex ++
      Seq((2L, "b"), (2L, "a"), (2L, "b"), (2L, "c")).zipWithIndex ++
      Seq((3L, "c"), (3L, "b"), (3L, "a")).zipWithIndex ++
      Seq((4L, "a"), (4L, "c"), (4L, "b")).zipWithIndex)
      .map { case ((u, sym), i) => (u, i.toLong * 10, sym, u * 100 + i) }
      .toDF("user_id", "t", "event_type", "event_id")
    val got = TemporalOps.sequentialPatterns(ev, "user_id", "t",
        "event_type", "event_id", supNum = 1, supDen = 2)
      .as[(Int, String, Long)].collect().toList
    assert(got == List(
      (1, "a", 4L), (1, "b", 4L), (1, "c", 4L),
      (2, "a>b", 3L), (2, "a>c", 3L),
      (2, "b>a", 2L), (2, "b>c", 2L), (2, "c>b", 2L),
      (3, "a>b>c", 2L)))
  }

  test("acf: alternating series hand values; calendar zero-fill; zero-variance null") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // grp "alt": one event per day for 8 days, daily sums 10,0,10,0,…
    // (period-2): exact r_1 = -0.875, r_2 = 0.75, r_3 = -0.625
    val alt = (0L until 8L).map(d =>
      ("alt", t(d), if (d % 2 == 0) 1.0 else 0.0))
    // grp "gap": events on days 0 and 2 only — the dense calendar
    // inserts day 1 as ZERO, giving series 10,0,10 (r_1 over the
    // 3-day grid, NOT a 2-row observed series)
    val gap = Seq(("gap", t(0), 1.0), ("gap", t(2), 1.0))
    // grp "flat": constant series → zero variance → null acf
    val flat = (0L until 4L).map(d => ("flat", t(d), 2.0))
    val ev = (alt ++ gap ++ flat).toDF("event_type", "ts", "value")
    val got = TemporalOps.acf(ev, col("event_type"), col("ts"),
        expr("CAST(floor(value * 10) AS BIGINT)"), maxLag = 3)
      .orderBy("grp", "k")
      .as[(String, Long, Long, Option[Double])].collect().toList
    assert(got == List(
      ("alt", 1L, 7L, Some(-0.875)), ("alt", 2L, 6L, Some(0.75)),
      ("alt", 3L, 5L, Some(-0.625)),
      ("flat", 1L, 3L, None), ("flat", 2L, 2L, None),
      ("flat", 3L, 1L, None),
      // series 10,0,10 (x̄ = 20/3): r_1 = −400/600 = −2/3, r_2 =
      // 100/600 = 1/6 — half-up at 6 dp
      ("gap", 1L, 2L, Some(-0.666667)), ("gap", 2L, 1L, Some(0.166667))))
  }

  test("stationaryDistribution: 2-state chain lands the 1/3–2/3 fixpoint; to-only state clipped") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // one user, sequence A,B,B,A,B → kernel P(A→B)=1, P(B→A)=P(B→B)=½
    // whose stationary is (1/3, 2/3); after 12 exact integer rounds
    // from uniform the pinned micro values are 333374023438 /
    // 666625976563 (convergence gap (−½)¹² — the GATE pins the
    // integer replay, not the limit)
    val ev = Seq("A", "B", "B", "A", "B").zipWithIndex
      .map { case (s, i) => (1L, t(i * 10), s, i.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = TemporalOps.stationaryDistribution(ev, Seq("user_id"),
        "ts", "event_type", "event_id")
      .orderBy("state")
      .as[(String, Long, Double)].collect().toList
    assert(got.map(r => (r._1, r._2)) ==
      List(("A", 333374023438L), ("B", 666625976563L)))
    assert(math.abs(got(1)._2 / 1e12 - 2.0 / 3.0) < 3e-4)
    // a to-only state (never a FROM) is clipped before iterating and
    // publishes nothing — the chain must be closed over from-states
    val ev2 = Seq("A", "B", "A", "Z").zipWithIndex
      .map { case (s, i) => (1L, t(i * 10), s, i.toLong) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val g2 = TemporalOps.stationaryDistribution(ev2, Seq("user_id"),
        "ts", "event_type", "event_id")
      .select("state").as[String].collect().toSet
    assert(g2 == Set("A", "B"))
  }

  test("ljungBox: alternating series Q exactly 22.5; zero-variance group nulls") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // the acf fixture: r = (−0.875, 0.75, −0.625) at n = 8 → every
    // quantized term is exact and Q = 8·10·(Σ u²·10³/(n−k))/10¹⁵ =
    // 80·0.28125 = 22.5 exactly; χ²(3, .95) = 7.815 → significant
    val alt = (0L until 8L).map(d =>
      ("alt", t(d), if (d % 2 == 0) 1.0 else 0.0))
    val flat = (0L until 4L).map(d => ("flat", t(d), 2.0))
    val got = TemporalOps.ljungBox((alt ++ flat).toDF("event_type", "ts", "value"),
        col("event_type"), col("ts"),
        expr("CAST(floor(value * 10) AS BIGINT)"), maxLag = 3,
        chiCrit = 7.815)
      .orderBy("grp")
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toList
    assert(got == List(
      ("alt", 8L, 3L, Some(22.5), true),
      ("flat", 4L, 3L, None, false)))
  }

  test("logRankTest: hand hypergeometric table; censored horizon user excluded from O") {
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // lifetimes (unit = 1 s): treated 1,3,5 → 100 s; control 2,4 →
    // 10 s; control 6 → 200 s and sets the horizon (censored under
    // censorGap 1 µs). Event times: t=10 (d=2, n1=3, n2=3) and t=100
    // (d=3, n1=3, n2=1) → O₁ = 3, E₁ = 1 + 2.25, V = 0.4 + 0.1875,
    // z = −0.25/√0.5875 — every quantized term lands exactly
    val ev = Seq(1L -> 100L, 3L -> 100L, 5L -> 100L,
      2L -> 10L, 4L -> 10L, 6L -> 200L).flatMap { case (u, last) =>
      Seq((u, t(0)), (u, t(last)))
    }.toDF("user_id", "ts")
    val got = TemporalOps.logRankTest(ev, censorGapUs = 1L,
        unitUs = 1000000L)
      .as[(Long, Long, Long, Double, Double, Option[Double], Boolean)]
      .head()
    assert(got == ((3L, 3L, 3L, 3.25, 0.5875, Some(-0.326164), false)))
  }

  test("trendRobust: monotone series hand S/z/slope; all-tied variance null") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400L * 1000)
    // "up": daily sums 10,20,30,40,50 — all 10 pairs rise: S = 10,
    // no ties: 18·Var = 5·4·15 = 300, z = 9/√(300/18); every pairwise
    // slope is exactly 10 deci-units/day
    val up = (0L until 5L).map(d => ("up", t(d), (d + 1).toDouble))
    val down = (0L until 5L).map(d => ("down", t(d), (5 - d).toDouble))
    // "tied": constant series — S = 0 and the tie correction cancels
    // 18·Var to 0 → z null; the slope median is still exactly 0
    val tied = (0L until 3L).map(d => ("tied", t(d), 3.0))
    val ev = (up ++ down ++ tied).toDF("event_type", "ts", "value")
    val got = TemporalOps.trendRobust(ev, col("event_type"), col("ts"),
        expr("CAST(floor(value * 10) AS BIGINT)"))
      .orderBy("grp")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().toList
    assert(got == List(
      ("down", 5L, -10L, Some(-2.2045407685048604), Some(-10.0)),
      ("tied", 3L, 0L, None, Some(0.0)),
      ("up", 5L, 10L, Some(2.2045407685048604), Some(10.0))))
  }
}
