package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{QueueConfig, QueueJob}

class QueueStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("every row of a micro-batch is processed, in claim-sized chunks (no silent drops)") {
    val dir = Files.createTempDirectory("graft_qstream").toString
    val requestDir = s"$dir/requests"
    val checkpointDir = s"$dir/checkpoint"

    // one source file: 60 claimable jobs -> one micro-batch -> 3 chunks
    // (25/25/10), plus terminal rows that must NOT be handed to process
    val jobs = (1L to 60L).map(i => QueueJob(i, 100 + i, 1, "pending",
      Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None)) ++ Seq(
      QueueJob(61L, 161L, 1, "completed", Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None),
      QueueJob(62L, 162L, 1, "failed", Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 3, None))
    jobs.toDF().coalesce(1).write.parquet(requestDir)

    val seen = mutable.ArrayBuffer.empty[Seq[Long]] // one entry per chunk
    val query = QueueStream.start(spark, requestDir, checkpointDir) { (chunk, _) =>
      val ids = chunk.select("job_id").collect().map(_.getLong(0)).toSeq
      seen.synchronized { seen += ids }
    }
    try {
      query.processAllAvailable()
    } finally query.stop()

    val chunks = seen.synchronized(seen.toList)
    assert(chunks.map(_.size).forall(_ <= QueueConfig().claimBatchSize),
      s"chunk sizes ${chunks.map(_.size)}")
    assert(chunks.map(_.size).sum == 60, "every claimable job processed exactly once")
    assert(chunks.flatten.toSet == (1L to 60L).toSet,
      "no claimable job dropped; completed + retry-exhausted rows never claimed")
    // priority order: chunks are carved in claim order (queued_time ties ->
    // job_id asc), so the first chunk is the lowest job ids
    assert(chunks.head.toSet == (1L to 25L).toSet)
  }

  test("no double claim: second same-checkpoint worker fences the first; takeover never re-claims") {
    // The reference's claim is two statements (SELECT then UPDATE,
    // VectorTableQueue.php:189-223): two pollers racing between them both
    // claim the same pending rows. Here the CLAIM IS THE MICRO-BATCH and
    // the checkpoint is the claim ledger, which closes the race: the
    // ledger admits ONE active worker — a second worker starting on it
    // FENCES the first out (spark.sql.streaming.stopActiveRunOnRestart,
    // on by default), resumes from the committed offsets, and so can
    // never re-claim a job the first worker already processed.
    val dir = Files.createTempDirectory("graft_qclaim").toString
    val requestDir = s"$dir/requests"
    val checkpointDir = s"$dir/checkpoint"
    def jobsFile(ids: Range): Unit = ids.map(i => QueueJob(i.toLong, 100L + i, 1, "pending",
        Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None))
      .toDF().coalesce(1).write.mode("append").parquet(requestDir)

    val claimedA = mutable.ArrayBuffer.empty[Long]
    val claimedB = mutable.ArrayBuffer.empty[Long]
    def claims(buf: mutable.ArrayBuffer[Long]) = (chunk: org.apache.spark.sql.DataFrame, _: Long) => {
      val ids = chunk.select("job_id").collect().map(_.getLong(0))
      buf.synchronized { buf ++= ids; () }
    }

    jobsFile(1 to 10)
    val workerA = QueueStream.start(spark, requestDir, checkpointDir)(claims(claimedA))
    val workerB =
      try {
        workerA.processAllAvailable()
        // second worker on the SAME claim ledger while A is still running
        QueueStream.start(spark, requestDir, checkpointDir)(claims(claimedB))
      } catch { case t: Throwable => workerA.stop(); throw t }
    try {
      workerB.processAllAvailable()
      assert(!workerA.isActive,
        "both workers active on one claim ledger — the double-claim race is open")
      assert(claimedB.synchronized(claimedB.isEmpty),
        s"takeover re-claimed ${claimedB.toList} — double claim!")
      // jobs landing AFTER the takeover go to the new worker only
      jobsFile(11 to 16)
      workerB.processAllAvailable()
    } finally {
      workerB.stop()
      workerA.stop()
    }

    val a = claimedA.synchronized(claimedA.toList)
    val b = claimedB.synchronized(claimedB.toList)
    assert(a.toSet == (1L to 10L).toSet, s"worker A claims: $a")
    assert(b.toSet == (11L to 16L).toSet,
      s"worker B must claim only post-takeover jobs, got: $b")
    assert(a.toSet.intersect(b.toSet).isEmpty, "a job was claimed twice across workers")
  }

  test("watermark drops rows later than the lateness bound in a real stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String, Timestamp, Int)]
    val stats = QueueStream.windowedStats(
      input.toDF().toDF("job_id", "status", "end_time", "chunk_count"),
      "5 minutes", "10 minutes")
    val query = stats.writeStream.format("memory").queryName("graft_wm")
      .outputMode(OutputMode.Append()).start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      // batch 1: establish event time up to 13:00 -> watermark 12:50
      input.addData((1L, "completed", ts("2026-01-10 12:01:00"), 1),
        (2L, "completed", ts("2026-01-10 13:00:00"), 1))
      query.processAllAvailable()
      // batch 2: a row at 12:02 is >10 min behind the watermark -> dropped;
      // 12:56 is within the bound -> kept
      input.addData((3L, "completed", ts("2026-01-10 12:02:00"), 7),
        (4L, "completed", ts("2026-01-10 12:56:00"), 1))
      query.processAllAvailable()
      // advance far enough to close and emit every open window
      input.addData((5L, "completed", ts("2026-01-10 14:00:00"), 1))
      query.processAllAvailable()

      val out = spark.table("graft_wm")
        .select(col("window.start").cast("string"), col("n_jobs"), col("n_chunks"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(out.contains(("2026-01-10 12:00:00", 1L, 1L)),
        s"12:00 window must contain ONLY job 1 - late job 3 (chunk_count 7) dropped: $out")
      assert(out.contains(("2026-01-10 12:55:00", 1L, 1L)), s"in-bound late row kept: $out")
      assert(out.contains(("2026-01-10 13:00:00", 1L, 1L)), out)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_wm")
    }
  }

  test("windowedStats: a real stream of in-bound rows equals the batch run (q149 contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, "completed", ts("2026-01-10 12:01:00"), 2),
      (2L, "completed", ts("2026-01-10 12:02:00"), 3),
      (3L, "failed", ts("2026-01-10 12:30:00"), 1))
    val input = MemoryStream[(Long, String, Timestamp, Int)]
    val query = QueueStream.windowedStats(
        input.toDF().toDF("job_id", "status", "end_time", "chunk_count"),
        "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("graft_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      // push event time far enough that every window above is emitted
      input.addData((99L, "completed", ts("2026-01-10 15:00:00"), 1))
      query.processAllAvailable()
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window.start").cast("string"), col("status"),
          col("n_jobs"), col("n_chunks"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val streamed = shape(spark.table("graft_parity")
        .filter(col("window.start") < ts("2026-01-10 15:00:00")))
      val batch = shape(QueueStream.windowedStats(
        rows.toDF("job_id", "status", "end_time", "chunk_count"),
        "5 minutes", "10 minutes"))
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_parity")
    }
  }

  test("windowedStats groups completions into event-time windows") {
    val completions = Seq(
      (1L, "completed", Timestamp.valueOf("2026-01-10 12:01:00"), 2),
      (2L, "completed", Timestamp.valueOf("2026-01-10 12:02:00"), 3),
      (3L, "failed", Timestamp.valueOf("2026-01-10 12:30:00"), 1)
    ).toDF("job_id", "status", "end_time", "chunk_count")
    val stats = QueueStream.windowedStats(completions, "5 minutes", "10 minutes")
      .select(col("window.start").cast("string").as("w"), col("status"), col("n_jobs"), col("n_chunks"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats == Set(
      ("2026-01-10 12:00:00", "completed", 2L, 5L),
      ("2026-01-10 12:30:00", "failed", 1L, 1L)))
  }
}
