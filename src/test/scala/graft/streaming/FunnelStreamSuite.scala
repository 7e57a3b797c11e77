package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Sessionize

/** Pins the streaming funnel tracker's parity with the batch min-cascade
  * (X68) on in-order feeds, plus its own state semantics. */
class FunnelStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val stages = Seq("view", "click", "buy")

  test("stage advances match the batch funnel's (stage, time) pairs") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      FunnelEvent(1L, "click", ts("2026-01-10 11:00:00")), // before any view
      FunnelEvent(1L, "view", ts("2026-01-10 12:00:00")),
      FunnelEvent(1L, "click", ts("2026-01-10 12:20:00")),
      FunnelEvent(1L, "buy", ts("2026-01-10 12:30:00")),
      FunnelEvent(2L, "view", ts("2026-01-10 09:00:00")),
      FunnelEvent(2L, "click", ts("2026-01-10 09:00:00")), // same instant: no chain
      FunnelEvent(3L, "click", ts("2026-01-10 10:00:00")), // never views
      FunnelEvent(4L, "view", ts("2026-01-10 08:00:00")),
      FunnelEvent(4L, "signup", ts("2026-01-10 08:30:00"))) // non-stage type ignored
    val input = MemoryStream[FunnelEvent]
    val query = FunnelStream.track(input.toDS(), stages)
      .writeStream.format("memory").queryName("graft_funnel_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_funnel_stream")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
        .toSet
      val batch = Sessionize.funnel(
          evs.toDS().toDF(), $"user_id", $"at", $"event_type", stages)
        .collect().flatMap { r =>
          (1 to stages.length).flatMap { i =>
            Option(r.getTimestamp(i)).map(t => (r.getLong(0), i, stages(i - 1), t))
          }
        }.toSet
      assert(streamed === batch, "stream/batch stage-advance divergence")
      assert(streamed.contains((1L, 3, "buy", ts("2026-01-10 12:30:00"))))
      assert(!streamed.exists(t => t._1 == 2L && t._2 == 2), "same-instant click chained")
      assert(!streamed.exists(_._1 == 3L), "click-only user entered the funnel")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_funnel_stream")
    }
  }

  test("state persists across micro-batches; duplicate stage events don't re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val query = FunnelStream.track(input.toDS(), stages)
      .writeStream.format("memory").queryName("graft_funnel_stream2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(FunnelEvent(9L, "view", ts("2026-01-10 10:00:00")))
      query.processAllAvailable()
      input.addData(
        FunnelEvent(9L, "view", ts("2026-01-10 10:05:00")),  // already viewed: no-op
        FunnelEvent(9L, "click", ts("2026-01-10 10:10:00"))) // advances in batch 2
      query.processAllAvailable()
      val got = spark.table("graft_funnel_stream2")
        .collect().map(r => (r.getInt(1), r.getString(2), r.getTimestamp(3))).toSeq
        .sortBy(_._1)
      assert(got === Seq((1, "view", ts("2026-01-10 10:00:00")),
        (2, "click", ts("2026-01-10 10:10:00"))))
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_funnel_stream2")
    }
  }

  test("idle horizon evicts stale users (restart from stage 0); in-horizon users unaffected") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    // 0-second lateness: the watermark tracks the max seen event time, so
    // eviction timing in this test is exactly horizon behind the feed
    val query = FunnelStream.track(
        input.toDS().withWatermark("at", "0 seconds"), stages,
        idleHorizonMs = Some(3600000L)) // 1 hour
      .writeStream.format("memory").queryName("graft_funnel_ttl")
      .outputMode(OutputMode.Update()).start()
    try {
      def batch(evs: FunnelEvent*): Unit = { input.addData(evs: _*); query.processAllAvailable() }
      batch(FunnelEvent(1L, "view", ts("2026-01-10 10:00:00")),
            FunnelEvent(2L, "view", ts("2026-01-10 10:00:00")))
      // in-horizon advance BEFORE any eviction
      batch(FunnelEvent(2L, "click", ts("2026-01-10 10:30:00")))
      // push the watermark past both users' horizons (u1 idle since 10:00,
      // u2 since 10:30; wm -> 13:00 after this batch)
      batch(FunnelEvent(3L, "view", ts("2026-01-10 13:00:00")))
      // at this batch's start wm = 13:00 -> u1 and u2 state evicted
      batch(FunnelEvent(3L, "click", ts("2026-01-10 13:05:00")))
      // u1 returns: click alone cannot advance (state restarted at stage
      // 0), the later view re-enters the funnel at stage 1
      batch(FunnelEvent(1L, "click", ts("2026-01-10 13:30:00")),
            FunnelEvent(1L, "view", ts("2026-01-10 13:40:00")))
      val got = spark.table("graft_funnel_ttl")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
        .toSet
      val expected = Set(
        (1L, 1, "view", ts("2026-01-10 10:00:00")),
        (2L, 1, "view", ts("2026-01-10 10:00:00")),
        (2L, 2, "click", ts("2026-01-10 10:30:00")),
        (3L, 1, "view", ts("2026-01-10 13:00:00")),
        (3L, 2, "click", ts("2026-01-10 13:05:00")),
        // the eviction proof: u1 re-emits stage 1 after returning
        (1L, 1, "view", ts("2026-01-10 13:40:00")))
      assert(got === expected, s"got $got")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_funnel_ttl")
    }
  }
}
