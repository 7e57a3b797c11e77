package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Gap30Min = 30L * 60 * 1000000

  test("sessions split on gaps > threshold, per user; numbering starts at 1") {
    val ev = Seq(
      (1L, 10L, ts("2026-01-10 12:00:00")),
      (2L, 10L, ts("2026-01-10 12:10:00")), // 10 min -> same session
      (3L, 10L, ts("2026-01-10 12:40:00")), // exactly 30 min -> same (gap must EXCEED)
      (4L, 10L, ts("2026-01-10 13:10:01")), // 30 min + 1s -> new session
      (5L, 20L, ts("2026-01-10 12:00:00"))  // other user: own numbering
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.assignSessions(ev, $"user_id", $"ts", $"event_id", Gap30Min)
      .select($"event_id", $"session_no").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("zero-gap ties never open a session and numbering is order-stable") {
    val ev = Seq(
      (1L, 10L, ts("2026-01-10 12:00:00")),
      (2L, 10L, ts("2026-01-10 12:00:00")), // tie: same instant
      (3L, 10L, ts("2026-01-10 13:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.assignSessions(ev, $"user_id", $"ts", $"event_id", Gap30Min)
      .select($"event_id", $"session_no").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("assignSessions guards: positive gap, session_no collision") {
    val ev = Seq((1L, 10L, ts("2026-01-10 12:00:00"))).toDF("event_id", "user_id", "ts")
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(ev, $"user_id", $"ts", $"event_id", 0L)
    }
    intercept[IllegalArgumentException] {
      Sessionize.assignSessions(ev.withColumn("session_no", lit(1L)),
        $"user_id", $"ts", $"event_id", Gap30Min)
    }
  }

  test("differential: assignSessions equals a naive per-user fold on random events") {
    val rnd = new scala.util.Random(7)
    val base = ts("2026-01-10 00:00:00").getTime
    val events = (1L to 300L).map { id =>
      val user = rnd.nextInt(5).toLong
      // gaps cluster around the 30-min threshold to stress the boundary
      val t = new Timestamp(base + rnd.nextInt(48) * 11 * 60000L + rnd.nextInt(1000))
      (id, user, t)
    }
    // reference: sort per user, fold a session counter
    val expected = events.groupBy(_._2).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._1))
      var sess = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || (e._3.getTime - prev) * 1000L > Gap30Min) sess += 1
        prev = e._3.getTime
        e._1 -> sess
      }
    }.toMap

    val got = Sessionize.assignSessions(
      events.toDF("event_id", "user_id", "ts"), $"user_id", $"ts", $"event_id", Gap30Min)
      .select($"event_id", $"session_no").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("streaming session_window merges gap-extending events and closes on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val out = Sessionize.streamingSessionStats(
      input.toDF().toDF("event_id", "uid", "ts"),
      col("uid"), "ts", gap = "30 minutes", watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("graft_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, 10L, ts("2026-01-10 12:00:00")),
        (2L, 10L, ts("2026-01-10 12:20:00")), // extends the session
        (3L, 20L, ts("2026-01-10 12:00:00")))
      query.processAllAvailable()
      // advance the watermark far past every open session's close
      input.addData((9L, 99L, ts("2026-01-10 15:00:00")))
      query.processAllAvailable()
      val got = spark.table("graft_sessions")
        .select(col("user_id"), col("session_start").cast("string"),
          col("session_end").cast("string"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      // session end = last event + gap (session_window semantics)
      assert(got.contains((10L, "2026-01-10 12:00:00", "2026-01-10 12:50:00", 2L)), got.toString)
      assert(got.contains((20L, "2026-01-10 12:00:00", "2026-01-10 12:30:00", 1L)), got.toString)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_sessions")
    }
  }

  test("funnel: stages chain only on strictly-later events; out-of-order never counts") {
    val ev = Seq(
      // user 1: full conversion, but the EARLIEST click precedes the first
      // view — t2 must pick the later click at 12:20
      (1L, 1L, "click", ts("2026-01-10 11:00:00")),
      (2L, 1L, "view", ts("2026-01-10 12:00:00")),
      (3L, 1L, "click", ts("2026-01-10 12:20:00")),
      (4L, 1L, "buy", ts("2026-01-10 12:30:00")),
      // user 2: view and click at the SAME instant -> click cannot chain
      (5L, 2L, "view", ts("2026-01-10 09:00:00")),
      (6L, 2L, "click", ts("2026-01-10 09:00:00")),
      // user 3: click only -> not in the funnel at all
      (7L, 3L, "click", ts("2026-01-10 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.funnel(ev, $"user_id", $"ts", $"event_type",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getInt(4)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((Some(ts("2026-01-10 12:00:00")),
      Some(ts("2026-01-10 12:20:00")), Some(ts("2026-01-10 12:30:00")), 3)))
    assert(out(2L) === ((Some(ts("2026-01-10 09:00:00")), None, None, 1)))
  }

  test("funnelCounts: survivors per stage, zero-filled tail stages") {
    val ev = Seq(
      (1L, 1L, "view", ts("2026-01-10 12:00:00")),
      (2L, 1L, "click", ts("2026-01-10 12:10:00")),
      (3L, 2L, "view", ts("2026-01-10 12:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val stages = Seq("view", "click", "buy")
    val got = Sessionize.funnelCounts(
        Sessionize.funnel(ev, $"user_id", $"ts", $"event_type", stages), stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(got === Seq((1, "view", 2L), (2, "click", 1L), (3, "buy", 0L)))
  }

  test("sessionTraces: ordered serialization per session, gap splits the trace") {
    val ev = Seq(
      (1L, 10L, "view", ts("2026-01-10 12:00:00")),
      (2L, 10L, "click", ts("2026-01-10 12:10:00")),
      (3L, 10L, "purchase", ts("2026-01-10 13:10:00")), // > 30 min -> session 2
      (4L, 20L, "view", ts("2026-01-10 12:00:00")),
      (5L, 20L, "error", ts("2026-01-10 12:00:00"))     // same instant: event_id order
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessionize.sessionTraces(ev, $"user_id", $"ts", $"event_id",
        $"event_type", Gap30Min)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(5))))
      .toMap
    assert(got === Map(
      (10L, 1L) -> ((2L, "view>click")),
      (10L, 2L) -> ((1L, "purchase")),
      (20L, 1L) -> ((2L, "view>error"))))
  }

  test("cohortRetention: Monday-week cohorts, gap weeks absent, multi-event weeks count once") {
    // 2026-01-05 is a Monday. user 1 cohort = wk0, active wk0 (twice) and
    // wk2; user 2 cohort = wk0, active wk0 only; user 3 cohort = wk1.
    val ev = Seq(
      (1L, 1L, ts("2026-01-05 10:00:00")),
      (2L, 1L, ts("2026-01-07 10:00:00")),  // same week, counts once
      (3L, 1L, ts("2026-01-19 10:00:00")),  // wk+2 (skipped wk+1)
      (4L, 2L, ts("2026-01-09 23:59:59")),
      (5L, 3L, ts("2026-01-12 00:00:00"))   // next Monday boundary
    ).toDF("event_id", "user_id", "ts")
    val wk0 = ts("2026-01-05 00:00:00").getTime / 1000
    val wk1 = ts("2026-01-12 00:00:00").getTime / 1000
    val got = Sessionize.cohortRetention(ev, $"user_id", $"ts")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === Set((wk0, 0, 2L), (wk0, 2, 1L), (wk1, 0, 1L)))
  }

  test("funnelLatency: per-transition seconds, only converting users counted") {
    val ev = Seq(
      (1L, 1L, "view", ts("2026-01-10 12:00:00")),
      (2L, 1L, "click", ts("2026-01-10 12:00:30")),   // 30 s
      (3L, 1L, "buy", ts("2026-01-10 12:02:30")),     // 120 s
      (4L, 2L, "view", ts("2026-01-10 09:00:00")),
      (5L, 2L, "click", ts("2026-01-10 09:01:30")),   // 90 s, never buys
      (6L, 3L, "view", ts("2026-01-10 10:00:00"))     // never clicks
    ).toDF("event_id", "user_id", "event_type", "ts")
    val stages = Seq("view", "click", "buy")
    val got = Sessionize.funnelLatency(
        Sessionize.funnel(ev, $"user_id", $"ts", $"event_type", stages), stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq.sortBy(_._1)
    assert(got === Seq(
      (2, "click", 2L, 60.0, 60.0),  // mean(30, 90), median interp = 60
      (3, "buy", 1L, 120.0, 120.0)))
  }

  test("funnel rejects duplicate stages") {
    val ev = Seq((1L, 1L, "a", ts("2026-01-10 12:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Sessionize.funnel(ev, $"user_id", $"ts", $"event_type", Seq("a", "a"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("ohlcBuckets: hand-computed candles; exact-ts tie resolves by value") {
    import java.sql.Timestamp
    def t(x: String) = Timestamp.valueOf(x)
    val ev = Seq(
      // user 1, bucket 10:00: open 5 (earliest), high 9, low 2, close 2
      (1L, t("2024-01-01 10:01:00"), 5.0),
      (1L, t("2024-01-01 10:20:00"), 9.0),
      (1L, t("2024-01-01 10:40:00"), 2.0),
      // user 1, bucket 11:00: single event
      (1L, t("2024-01-01 11:05:00"), 7.0),
      // user 2, bucket 10:00: two events at the SAME timestamp — open is
      // the smaller value, close the larger (the (ts, value) tie rule)
      (2L, t("2024-01-01 10:30:00"), 8.0),
      (2L, t("2024-01-01 10:30:00"), 3.0)
    ).toDF("u", "ts", "v")
    val out = Sessionize.ohlcBuckets(ev, col("u"), col("ts"), col("v"), "1 hour")
      .orderBy(col("key"), col("bucket_start")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    val b10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    val b11 = Timestamp.valueOf("2024-01-01 11:00:00").getTime / 1000
    assert(out.toSeq === Seq(
      (1L, b10, 3L, 5.0, 9.0, 2.0, 2.0, 16.0),
      (1L, b11, 1L, 7.0, 7.0, 7.0, 7.0, 7.0),
      (2L, b10, 2L, 3.0, 8.0, 3.0, 8.0, 11.0)))
    intercept[IllegalArgumentException](
      Sessionize.ohlcBuckets(ev, col("u"), col("ts"), col("v"), ""))
  }

  test("bucketPipeline: zero-filled gaps, derivative/cumsum/moving avg (X236)") {
    // hours 0, 1 and 3 have events — hour 2 must appear as a ZERO
    // bucket or the derivative across the gap lies
    val ev = Seq(
      (1L, ts("2026-01-01 00:10:00")), (2L, ts("2026-01-01 00:20:00")),
      (3L, ts("2026-01-01 01:30:00")),
      (4L, ts("2026-01-01 03:05:00")), (5L, ts("2026-01-01 03:55:00")),
      (6L, ts("2026-01-01 03:59:00"))
    ).toDF("id", "ts")
    val got = Sessionize.bucketPipeline(ev, $"ts", widthSeconds = 3600L)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4))).toSeq
    assert(got === Seq(
      (2L, 2L, None, 2.0),          // first bucket: derivative null
      (1L, 3L, Some(-1L), 1.5),
      (0L, 3L, Some(-1L), 1.0),     // the gap-filled empty hour
      (3L, 6L, Some(3L), round6(4.0 / 3.0))))
    intercept[IllegalArgumentException](
      Sessionize.bucketPipeline(ev, $"ts", 0L))
    intercept[IllegalArgumentException](
      Sessionize.bucketPipeline(ev, $"ts", 3600L, 0))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("serialDiff: seasonal lag over the gap-filled spine; first lag buckets null (X258)") {
    // hours 0,1,3 have events (hour 2 zero-filled); lag 2 compares
    // each bucket with the one two hours earlier
    val ev = Seq(
      (1L, ts("2026-01-01 00:10:00")), (2L, ts("2026-01-01 00:20:00")),
      (3L, ts("2026-01-01 01:30:00")),
      (4L, ts("2026-01-01 03:05:00")), (5L, ts("2026-01-01 03:55:00"))
    ).toDF("id", "ts")
    val got = Sessionize.serialDiff(ev, $"ts", 3600L, lagN = 2)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got === Seq(
      (2L, None), (1L, None),          // first lag buckets: nothing to subtract
      (0L, Some(-2L)),                 // zero-filled hour vs hour 0
      (2L, Some(1L))))                 // hour 3 vs hour 1
    intercept[IllegalArgumentException](Sessionize.serialDiff(ev, $"ts", 3600L, 0))
    intercept[IllegalArgumentException](Sessionize.serialDiff(ev, $"ts", 0L, 1))
  }

  test("valueHistogram: floor buckets incl. negatives, zero fill, nulls excluded (X256)") {
    val df = Seq[java.lang.Double](-7.0, -2.0, 3.0, 4.9, 12.0, null).toDF("v")
    val got = Sessionize.valueHistogram(df, $"v", interval = 5.0)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // floor(-7/5) = -2 (true floor, not toward zero); bucket -5..0
    // holds -2; 0..5 holds 3 and 4.9; 5..10 zero-filled; 10..15 holds 12
    assert(got === Seq(
      (-10.0, 1L), (-5.0, 1L), (0.0, 2L), (5.0, 0L), (10.0, 1L)))
    assert(Sessionize.valueHistogram(df.limit(0), $"v", 5.0).isEmpty)
    intercept[IllegalArgumentException](Sessionize.valueHistogram(df, $"v", 0.0))
  }

  test("autoDateHistogram: smallest fitting ladder width; overflow tops at 7d (X267)") {
    // events span ~3h5m: 1h buckets -> 4 (fits 5); 30m -> 8 (needs 8)
    val ev = Seq(
      (1L, ts("2026-01-01 00:10:00")), (2L, ts("2026-01-01 01:30:00")),
      (3L, ts("2026-01-01 03:15:00"))).toDF("id", "ts")
    val got = Sessionize.autoDateHistogram(ev, $"ts", targetBuckets = 5)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2).distinct === Seq(3600L),
      "1h is the smallest ladder width with <= 5 buckets")
    assert(got.map(_._1) === Seq(1L, 1L, 0L, 1L), "gap hour zero-fills")
    // a tighter target widens the interval
    val wide = Sessionize.autoDateHistogram(ev, $"ts", targetBuckets = 2)
      .collect().map(_.getLong(2)).distinct.toSeq
    assert(wide === Seq(10800L), "3h fits 2 buckets where 1h needs 4")
    // a span even 7d cannot fit falls back to the top rung
    val years = Seq((1L, ts("2020-01-01 00:00:00")),
      (2L, ts("2026-01-01 00:00:00"))).toDF("id", "ts")
    assert(Sessionize.autoDateHistogram(years, $"ts", 2)
      .head().getLong(2) === 604800L)
    assert(Sessionize.autoDateHistogram(ev.limit(0), $"ts", 5).isEmpty)
    intercept[IllegalArgumentException](
      Sessionize.autoDateHistogram(ev, $"ts", 0))
  }

  test("autoDateHistogramCalendar: calendar rungs, UTC month starts, zero-fill (X271)") {
    // span ~14 months: 7d -> ~62 buckets; 1M -> 15 (fits 20)
    val ev = Seq(
      (1L, ts("2025-01-15 12:00:00")), (2L, ts("2025-01-20 00:00:00")),
      (3L, ts("2025-03-02 08:00:00")), (4L, ts("2026-02-28 23:59:59"))
    ).toDF("id", "ts")
    val got = Sessionize.autoDateHistogramCalendar(ev, $"ts", targetBuckets = 20)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getString(2)))
      .toSeq
    assert(got.map(_._3).distinct === Seq("1M"))
    assert(got.size === 14, "gapless month spine Jan 2025 .. Feb 2026")
    assert(got.head === (("2025-01-01 00:00:00.0", 2L, "1M")))
    assert(got(2) === (("2025-03-01 00:00:00.0", 1L, "1M")))
    assert(got(1)._2 === 0L && got.last._2 === 1L)
    // a tighter target climbs to quarters, then years
    val q = Sessionize.autoDateHistogramCalendar(ev, $"ts", targetBuckets = 6)
      .collect().map(_.getString(2)).distinct.toSeq
    assert(q === Seq("3M"), "quarters fit 6 where months need 14")
    val y = Sessionize.autoDateHistogramCalendar(ev, $"ts", targetBuckets = 2)
      .orderBy($"bucket_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getString(2)))
    assert(y.toSeq === Seq(("2025-01-01 00:00:00.0", 3L, "1y"),
      ("2026-01-01 00:00:00.0", 1L, "1y")))
    // a fixed rung that fits short-circuits to X267's buckets
    // (span ~3 days: 12h needs 6 buckets, 1d needs 3 — 1d wins at 5)
    val day = Seq((1L, ts("2026-01-01 01:00:00")),
      (2L, ts("2026-01-03 23:00:00"))).toDF("id", "ts")
    val f = Sessionize.autoDateHistogramCalendar(day, $"ts", targetBuckets = 5)
      .orderBy($"bucket_start").collect()
    assert(f.map(_.getString(2)).distinct.toSeq === Seq("1d"))
    assert(f.map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq ===
      Seq(("2026-01-01 00:00:00.0", 1L), ("2026-01-02 00:00:00.0", 0L),
        ("2026-01-03 00:00:00.0", 1L)))
    assert(Sessionize.autoDateHistogramCalendar(ev.limit(0), $"ts", 5).isEmpty)
    intercept[IllegalArgumentException](
      Sessionize.autoDateHistogramCalendar(ev, $"ts", 0))
  }

  test("cumulativeCardinality: first-seen exactness, flat tail, zero-fill (X266)") {
    // hour 0: users 1,2; hour 1: user 1 again (returning — no new);
    // hour 2: empty; hour 3: users 2 (returning) and 3 (new)
    val ev = Seq(
      (1L, ts("2026-01-01 00:10:00")), (2L, ts("2026-01-01 00:20:00")),
      (1L, ts("2026-01-01 01:30:00")),
      (2L, ts("2026-01-01 03:05:00")), (3L, ts("2026-01-01 03:55:00"))
    ).toDF("user_id", "ts")
    val got = Sessionize.cumulativeCardinality(ev, $"ts", 3600L, $"user_id")
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((2L, 2L), (0L, 2L), (0L, 2L), (1L, 3L)))
    // a trailing returning-only bucket still renders the flat curve
    val ev2 = ev.union(Seq((1L, ts("2026-01-01 05:00:00")))
      .toDF("user_id", "ts"))
    val tail = Sessionize.cumulativeCardinality(ev2, $"ts", 3600L, $"user_id")
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(tail === Seq((2L, 2L), (0L, 2L), (0L, 2L), (1L, 3L),
      (0L, 3L), (0L, 3L)))
    intercept[IllegalArgumentException](
      Sessionize.cumulativeCardinality(ev, $"ts", 0L, $"user_id"))
  }

  test("bucketSort: metric order, deterministic tiebreak, from/size cuts (X275)") {
    val buckets = Seq(
      ("a", 5L, 1.0), ("b", 9L, 2.0), ("c", 5L, 3.0),
      ("d", 1L, 4.0), ("e", 9L, 5.0)).toDF("key", "n", "m")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getString(0)).toSeq
    // n desc; ties (b,e @9 and a,c @5) break by the remaining columns
    // ascending in frame order — key first
    assert(keys(Sessionize.bucketSort(buckets, Seq(("n", false)))) ===
      Seq("b", "e", "a", "c", "d"))
    // from skips, size truncates — the ES pagination pair
    assert(keys(Sessionize.bucketSort(buckets, Seq(("n", false)),
      from = 1, size = Some(2))) === Seq("e", "a"))
    // size alone is a heap cut
    assert(keys(Sessionize.bucketSort(buckets, Seq(("n", false)),
      size = Some(1))) === Seq("b"))
    // multi-key: n asc then m desc
    assert(keys(Sessionize.bucketSort(buckets,
      Seq(("n", true), ("m", false)))) === Seq("d", "c", "a", "e", "b"))
    intercept[IllegalArgumentException](Sessionize.bucketSort(buckets, Nil))
    intercept[IllegalArgumentException](
      Sessionize.bucketSort(buckets, Seq(("nope", true))))
    intercept[IllegalArgumentException](
      Sessionize.bucketSort(buckets, Seq(("n", true)), from = -1))
    intercept[IllegalArgumentException](
      Sessionize.bucketSort(buckets, Seq(("n", true)), size = Some(0)))
  }

  test("bucketStats: decimal sum, round-6 avg, tie-keeping sorted extreme keys (X257)") {
    val b = Seq(("a", 4.0), ("b", 1.0), ("c", 4.0), ("d", 2.0)).toDF("k", "v")
    val row = Sessionize.bucketStats(b, $"k", $"v").head()
    assert(row.getLong(0) === 4L)
    assert(row.getDouble(1) === 1.0 && row.getDouble(2) === 4.0)
    assert(row.getDouble(3) === 11.0 && row.getDouble(4) === 2.75)
    assert(row.getString(5) === "b")
    assert(row.getString(6) === "a,c", "max tie keeps every key, sorted")
  }

  test("percentilesExact: type-7 interpolation, per-key, null-excluded (X237)") {
    // key a: values 10, 20, 30, 40 -> p50 = 25 (k=1, f=0.5),
    // p0 = 10, p1.0 = 40 (k = n-1, hi absent -> lo)
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("a", Some(40.0)), ("a", None),
      ("b", Some(5.0))
    ).toDF("k", "v")
    val got = Sessionize.percentilesExact(df, $"k", $"v",
        Seq(0.0, 0.5, 1.0))
      .orderBy($"key", $"p").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      ("a", 0.0, 4L, 10.0), ("a", 0.5, 4L, 25.0), ("a", 1.0, 4L, 40.0),
      ("b", 0.0, 1L, 5.0), ("b", 0.5, 1L, 5.0), ("b", 1.0, 1L, 5.0)))
    intercept[IllegalArgumentException](
      Sessionize.percentilesExact(df, $"k", $"v", Nil))
    intercept[IllegalArgumentException](
      Sessionize.percentilesExact(df, $"k", $"v", Seq(1.5)))
    intercept[IllegalArgumentException](
      Sessionize.percentilesExact(df, $"k", $"v", Seq(0.5, 0.5)))
  }

  test("decayedActivity: weight halves per half-life, anchored at max(ts)") {
    // anchor = 2026-01-08 00:00 (user 30's event); one half-life = 1 day
    val ev = Seq(
      (10L, ts("2026-01-08 00:00:00"), 1.0), // age 0          -> 1.0
      (10L, ts("2026-01-07 00:00:00"), 1.0), // 1 half-life    -> 0.5
      (20L, ts("2026-01-06 00:00:00"), 1.0), // 2 half-lives   -> 0.25
      (20L, ts("2026-01-06 00:00:00"), 3.0), // value scales   -> 0.75
      (30L, ts("2026-01-08 00:00:00"), 2.0)  // the anchor row -> 2.0
    ).toDF("user_id", "ts", "v")
    val got = Sessionize.decayedActivity(ev, $"user_id", $"ts", $"v",
        halfLifeDays = 1.0, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    // 2^-k is exact in IEEE, so the rounded weights are exact here
    assert(got === Seq((30L, 1L, 2.0), (10L, 2L, 1.5), (20L, 2L, 1.0)))
  }

  test("decayedActivity: ties order by key; k cuts; invalid args rejected") {
    val ev = Seq(
      (2L, ts("2026-01-08 00:00:00"), 1.0),
      (1L, ts("2026-01-08 00:00:00"), 1.0),
      (3L, ts("2026-01-01 00:00:00"), 1.0)
    ).toDF("user_id", "ts", "v")
    val got = Sessionize.decayedActivity(ev, $"user_id", $"ts", $"v", 1.0, 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L)) // tie at 1.0 -> key asc; k=2 cuts user 3
    intercept[IllegalArgumentException](
      Sessionize.decayedActivity(ev, $"user_id", $"ts", $"v", 0.0, 2))
    intercept[IllegalArgumentException](
      Sessionize.decayedActivity(ev, $"user_id", $"ts", $"v", 1.0, 0))
  }

  test("boxplot: five-number summary matches hand-computed type-7 quartiles (X292)") {
    // key 'a': sorted 1..5 -> q1=2, q2=3, q3=4; key 'b': [10, 20] ->
    // q1=12.5, q2=15, q3=17.5 (interpolated)
    val df = (Seq(5.0, 3.0, 1.0, 4.0, 2.0).map(("a", _)) ++
      Seq(("b", 10.0), ("b", 20.0))).toDF("k", "v")
    val got = Sessionize.boxplot(df, col("k"), col("v"))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq === Seq(
      ("a", 5L, 1.0, 2.0, 3.0, 4.0, 5.0),
      ("b", 2L, 10.0, 12.5, 15.0, 17.5, 20.0)))
  }

  test("normalizeBucket: six ES methods on a hand fixture; degenerate series pin to 0 (X295)") {
    val df = Seq(1.0, 2.0, 3.0).map(("b", _)).toDF("k", "v")
    def got(method: String): Seq[Double] =
      Sessionize.normalizeBucket(df, col("v"), method)
        .orderBy(col("v")).select(col("normalized"))
        .collect().map(_.getDouble(0)).toSeq
    def close(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 }
    assert(got("rescale_0_1") === Seq(0.0, 0.5, 1.0))
    assert(got("rescale_0_100") === Seq(0.0, 50.0, 100.0))
    assert(close(got("percent_of_sum"), Seq(16.666667, 33.333333, 50.0)))
    assert(got("mean") === Seq(-0.5, 0.0, 0.5))
    // std = sqrt(2/3)
    assert(close(got("zscore"), Seq(-1.224745, 0.0, 1.224745)))
    assert(close(got("softmax"), Seq(0.090031, 0.244728, 0.665241)))
    // constant series: every range/stddev method pins to 0, the
    // share-style methods split evenly
    val const = Seq(5.0, 5.0).map(("b", _)).toDF("k", "v")
    def gotC(m: String) = Sessionize.normalizeBucket(const, col("v"), m)
      .select(col("normalized")).collect().map(_.getDouble(0)).toSeq
    assert(gotC("rescale_0_1") === Seq(0.0, 0.0))
    assert(gotC("mean") === Seq(0.0, 0.0))
    assert(gotC("zscore") === Seq(0.0, 0.0))
    assert(gotC("percent_of_sum") === Seq(50.0, 50.0))
    assert(gotC("softmax") === Seq(0.5, 0.5))
    intercept[IllegalArgumentException](
      Sessionize.normalizeBucket(df, col("v"), "nope"))
    intercept[IllegalArgumentException](
      Sessionize.normalizeBucket(df.withColumnRenamed("k", "normalized"),
        col("v"), "mean"))
    // softmax's e^x domain restriction must not leak into other
    // methods: a metric large enough to overflow exp still rescales
    // (ANSI would throw on the decimal cast of Infinity)
    val big = Seq(0.0, 1000.0).map(("b", _)).toDF("k", "v")
    assert(Sessionize.normalizeBucket(big, col("v"), "rescale_0_1")
      .orderBy(col("v")).select(col("normalized"))
      .collect().map(_.getDouble(0)).toSeq === Seq(0.0, 1.0))
  }

  test("madExact: deviations measured against the published round-6 median (X293)") {
    // [1, 2, 4, 100]: median 3, |dev| = [2, 1, 1, 97] -> mad 1.5 —
    // the outlier that would wreck a stddev barely moves the MAD
    val df = Seq(1.0, 2.0, 4.0, 100.0).map(("a", _)).toDF("k", "v")
    val got = Sessionize.madExact(df, col("k"), col("v")).head()
    assert((got.getString(0), got.getLong(1), got.getDouble(2),
      got.getDouble(3)) === (("a", 4L, 3.0, 1.5)))
    // singleton key: median = the value, mad = 0
    val one = Sessionize.madExact(
      Seq(("x", 7.0)).toDF("k", "v"), col("k"), col("v")).head()
    assert(one.getDouble(2) === 7.0 && one.getDouble(3) === 0.0)
  }

  test("movingPercentiles: trailing window union, gap buckets, empty-window null (X303)") {
    // hour 0: values 10, 20; hour 1: gap; hour 2: value 30; hour 3: an
    // event with NULL value (extends the spine, contributes nothing)
    val ev = Seq(
      (1L, ts("2026-01-01 00:10:00"), Some(10.0)),
      (2L, ts("2026-01-01 00:20:00"), Some(20.0)),
      (3L, ts("2026-01-01 02:30:00"), Some(30.0)),
      (4L, ts("2026-01-01 03:05:00"), None: Option[Double])
    ).toDF("id", "ts", "value")
    def run(w: Int) = Sessionize.movingPercentiles(ev, $"ts", $"value",
        widthSeconds = 3600L, windowW = w, ps = Seq(0.5))
      .orderBy($"bucket_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    // window 2: each bucket sees the union of itself + the previous one
    val base = 1767225600L // 2026-01-01 00:00 UTC
    assert(run(2) === Seq(
      (base + 0L, 2L, 2L, Some(15.0)),
      (base + 3600L, 0L, 2L, Some(15.0)), // gap inherits hour 0
      (base + 7200L, 1L, 1L, Some(30.0)),
      (base + 10800L, 1L, 1L, Some(30.0))))
    // window 1: the gap hour and the null-value hour have EMPTY windows
    assert(run(1).map(t => (t._2, t._3, t._4)) === Seq(
      (2L, 2L, Some(15.0)), (0L, 0L, None),
      (1L, 1L, Some(30.0)), (1L, 0L, None)))
    intercept[IllegalArgumentException](Sessionize.movingPercentiles(
      ev, $"ts", $"value", 3600L, 0, Seq(0.5)))
    intercept[IllegalArgumentException](Sessionize.movingPercentiles(
      ev, $"ts", $"value", 3600L, 65, Seq(0.5)))
  }
}
