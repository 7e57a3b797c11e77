package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JobTrackerSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tracker state survives a checkpoint restart: claim before, fail after") {
    import java.nio.file.Files
    import scala.collection.mutable
    val dir = Files.createTempDirectory("graft_tracker_ckpt").toString
    val schema = org.apache.spark.sql.Encoders.product[JobEvent].schema
    val states = mutable.Map.empty[Long, (String, Int)]

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/events")
        .withWatermark("at", "0 seconds").as[JobEvent]
      val q = JobTracker.track(stream)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[JobState], _: Long) =>
          batch.collect().foreach(s =>
            states.synchronized { states(s.post_id) = (s.status, s.error_count) })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Seq(JobEvent(1L, "enqueue", ts("2026-01-10 12:00:00")),
        JobEvent(1L, "claim", ts("2026-01-10 12:01:00"))).toDS()
      .write.mode("append").parquet(s"$dir/events")
    runOnce()
    assert(states.synchronized(states(1L)) === (("processing", 0)))
    // restart: the fail must transition the RESTORED processing state —
    // if state were lost, fail-on-non-processing is a no-op and
    // error_count would stay 0
    Seq(JobEvent(1L, "fail", ts("2026-01-10 12:02:00"))).toDS()
      .write.mode("append").parquet(s"$dir/events")
    runOnce()
    assert(states.synchronized(states(1L)) === (("failed", 1)),
      s"processing state must survive the restart for the fail to count: $states")
  }

  test("stateful tracker: transitions + event-time reaper timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[JobEvent]
    val tracked = JobTracker.track(
      input.toDS().withWatermark("at", "0 seconds").as[JobEvent])
    val query = tracked.writeStream.format("memory").queryName("graft_jobs")
      .outputMode(OutputMode.Update()).start()
    try {
      // post 1: enqueue -> claim -> complete (normal life)
      // post 2: enqueue -> claim ... then silence -> must be reaped
      input.addData(
        JobEvent(1L, "enqueue", ts("2026-01-10 12:00:00")),
        JobEvent(2L, "enqueue", ts("2026-01-10 12:00:00")))
      query.processAllAvailable()
      input.addData(
        JobEvent(1L, "claim", ts("2026-01-10 12:01:00")),
        JobEvent(2L, "claim", ts("2026-01-10 12:01:00")))
      query.processAllAvailable()
      input.addData(JobEvent(1L, "complete", ts("2026-01-10 12:05:00")))
      query.processAllAvailable()
      // advance the watermark past 12:01 + 15 min; the new watermark takes
      // effect in the NEXT micro-batch, so nudge once more -> post 2 times out
      input.addData(JobEvent(99L, "enqueue", ts("2026-01-10 12:30:00")))
      query.processAllAvailable()
      input.addData(JobEvent(98L, "enqueue", ts("2026-01-10 12:31:00")))
      query.processAllAvailable()

      val states = spark.table("graft_jobs")
        .groupBy("post_id").agg(
          max(struct(col("since"), col("status"), col("error_count"), col("timed_out"))).as("last"))
        .select(col("post_id"), col("last.status"), col("last.error_count"), col("last.timed_out"))
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getBoolean(3)))).toMap

      assert(states(1L) == (("completed", 0, false)))
      assert(states(2L)._1 == "failed", s"silent processing job must be reaped: $states")
      assert(states(2L)._2 == 1 && states(2L)._3, "reap increments error_count, marks timeout")
      assert(states(99L)._1 == "pending")

      // completed job must NOT have been reaped despite its timeout having
      // been armed at claim (completion cleared it by updating state)
      val p1 = spark.table("graft_jobs").filter($"post_id" === 1L && $"timed_out")
      assert(p1.isEmpty, "no timeout transition for a completed job")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_jobs")
    }
  }

  test("retry-exhausted posts cannot be resurrected by a claim (batch-path parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[JobEvent]
    val tracked = JobTracker.track(
      input.toDS().withWatermark("at", "0 seconds").as[JobEvent])
    val query = tracked.writeStream.format("memory").queryName("graft_jobs3")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        JobEvent(5L, "enqueue", ts("2026-01-10 12:00:00")),
        JobEvent(5L, "claim", ts("2026-01-10 12:01:00")),
        JobEvent(5L, "fail", ts("2026-01-10 12:02:00")),
        JobEvent(5L, "claim", ts("2026-01-10 12:03:00")),
        JobEvent(5L, "fail", ts("2026-01-10 12:04:00")),
        JobEvent(5L, "claim", ts("2026-01-10 12:05:00")),
        JobEvent(5L, "fail", ts("2026-01-10 12:06:00"))) // error_count = 3 = maxRetries
      query.processAllAvailable()
      // a REDELIVERED fail (at-least-once source) must be a no-op — it
      // must not push error_count past the budget and free the state for
      // resurrection — and a claim must stay blocked
      input.addData(
        JobEvent(5L, "fail", ts("2026-01-10 12:06:30")),
        JobEvent(5L, "claim", ts("2026-01-10 12:07:00")))
      query.processAllAvailable()
      val after = spark.table("graft_jobs3").orderBy($"since".desc).head()
      assert(after.getAs[String]("status") == "failed",
        "claim past the retry budget must not transition to processing")
      assert(after.getAs[Int]("error_count") == 3,
        "duplicate fail on a non-processing job is idempotent")
      val processingAfterExhaustion = spark.table("graft_jobs3")
        .filter($"status" === "processing" && $"since" === ts("2026-01-10 12:07:00"))
      assert(processingAfterExhaustion.isEmpty)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_jobs3")
    }
  }

  test("fail events accumulate error_count through the state machine") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[JobEvent]
    val tracked = JobTracker.track(
      input.toDS().withWatermark("at", "0 seconds").as[JobEvent])
    val query = tracked.writeStream.format("memory").queryName("graft_jobs2")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        JobEvent(7L, "enqueue", ts("2026-01-10 12:00:00")),
        JobEvent(7L, "claim", ts("2026-01-10 12:01:00")),
        JobEvent(7L, "fail", ts("2026-01-10 12:02:00")),
        JobEvent(7L, "claim", ts("2026-01-10 12:03:00")),
        JobEvent(7L, "fail", ts("2026-01-10 12:04:00")))
      query.processAllAvailable()
      val last = spark.table("graft_jobs2").orderBy($"since".desc).head()
      assert(last.getAs[String]("status") == "failed")
      assert(last.getAs[Int]("error_count") == 2, "two fails -> error_count 2")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_jobs2")
    }
  }
}
