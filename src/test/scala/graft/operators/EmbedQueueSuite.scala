package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{QueueConfig, QueueJob}

/** Queue state-machine tests with an injected clock (SURVEY.md §5 item 5):
  * claim priority and batch cap, fail x3 -> unclaimable, the 15-minute
  * reaper INCLUDING the exact-cutoff boundary, GC retention boundaries,
  * enqueue dedup + id assignment (reference `src/VectorTableQueue.php:
  * 184-331`). */
class EmbedQueueSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val t0 = ts("2026-01-10 12:00:00")

  private def job(id: Long, post: Long, status: String, queued: String,
      start: Option[String] = None, end: Option[String] = None,
      errors: Int = 0): QueueJob =
    QueueJob(id, post, 1, status, ts(queued), start.map(ts), end.map(ts), errors, None)

  private def df(jobs: QueueJob*): DataFrame = jobs.toDF()

  private def statusOf(q: DataFrame): Map[Long, (String, Int)] =
    q.select("job_id", "status", "error_count").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  private val cfg = QueueConfig(claimBatchSize = 2)

  test("Q3: claim takes pending before retryable-failed, oldest first, capped at batch size") {
    val q = df(
      job(1, 101, "failed", "2026-01-10 09:00:00", errors = 1),  // retryable, oldest overall
      job(2, 102, "pending", "2026-01-10 11:00:00"),
      job(3, 103, "pending", "2026-01-10 10:00:00"),
      job(4, 104, "completed", "2026-01-10 08:00:00"))
    val picked = EmbedQueue.nextBatch(q, cfg).select("job_id").collect().map(_.getLong(0)).toSeq
    // pending first (3 then 2 by queued_time), failed-retryable would be next but cap=2
    assert(picked == Seq(3L, 2L))

    val claimed = EmbedQueue.claim(q, t0, cfg)
    val st = statusOf(claimed)
    assert(st(3L)._1 == "processing" && st(2L)._1 == "processing")
    assert(st(1L)._1 == "failed", "beyond the cap - untouched")
    assert(st(4L)._1 == "completed")
    val starts = claimed.filter($"status" === "processing").select("start_time")
      .collect().map(_.getTimestamp(0)).toSet
    assert(starts == Set(t0), "claim stamps start_time = now")
  }

  test("Q4/Q5: fail increments error_count; at maxRetries the job is unclaimable") {
    var q = df(job(1, 101, "pending", "2026-01-10 09:00:00"))
    (1 to 3).foreach { i =>
      q = EmbedQueue.claim(q, t0, cfg)
      assert(statusOf(q)(1L)._1 == "processing", s"round $i claimable")
      q = EmbedQueue.fail(q, Seq(101L), t0, s"boom $i")
      assert(statusOf(q)(1L) == (("failed", i)))
    }
    // error_count == 3 == maxRetries -> NOT retryable (error_count < 3 fails)
    assert(EmbedQueue.nextBatch(q, cfg).isEmpty)
    val reclaimed = EmbedQueue.claim(q, t0, cfg)
    assert(statusOf(reclaimed)(1L)._1 == "failed", "stays failed forever")
  }

  test("Q4: complete only touches processing rows of the given posts") {
    val q = df(
      job(1, 101, "processing", "2026-01-10 09:00:00", start = Some("2026-01-10 11:59:00")),
      job(2, 102, "pending", "2026-01-10 09:00:00"))
    val done = EmbedQueue.complete(q, Seq(101L, 102L), t0)
    val st = statusOf(done)
    assert(st(1L)._1 == "completed")
    assert(st(2L)._1 == "pending", "pending row is not completable")
    val end = done.filter($"job_id" === 1).select("end_time").head().getTimestamp(0)
    assert(end == t0)
  }

  test("Q6: reaper boundary - strictly older than cutoff fails; exactly-at-cutoff survives") {
    // cutoff = t0 - 15 min = 11:45:00
    val q = df(
      job(1, 101, "processing", "2026-01-10 09:00:00", start = Some("2026-01-10 11:44:59")),
      job(2, 102, "processing", "2026-01-10 09:00:00", start = Some("2026-01-10 11:45:00")),
      job(3, 103, "processing", "2026-01-10 09:00:00", start = Some("2026-01-10 11:50:00")))
    val reaped = EmbedQueue.reapTimeouts(q, t0)
    val st = statusOf(reaped)
    assert(st(1L) == (("failed", 1)), "1s past the timeout -> reaped, error_count+1")
    assert(st(2L)._1 == "processing", "start_time == cutoff is NOT strictly older")
    assert(st(3L)._1 == "processing")
    val msg = reaped.filter($"job_id" === 1).select("error_message").head().getString(0)
    assert(msg == "processing timeout")
  }

  test("Q7: GC drops completed past retention and failed past maxRetries - boundaries exact") {
    // retention cutoff = t0 - 3 days = 2026-01-07 12:00:00
    val q = df(
      job(1, 101, "completed", "2026-01-01 00:00:00", end = Some("2026-01-07 11:59:59")),
      job(2, 102, "completed", "2026-01-01 00:00:00", end = Some("2026-01-07 12:00:00")),
      job(3, 103, "failed", "2026-01-01 00:00:00", errors = 4), // > maxRetries -> dropped
      job(4, 104, "failed", "2026-01-01 00:00:00", errors = 3), // == maxRetries -> kept (php quirk)
      job(5, 105, "pending", "2026-01-01 00:00:00"))
    val kept = EmbedQueue.gc(q, t0).select("job_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L))
  }

  test("Q1/Q2: enqueue dedups already-queued posts and assigns dense ids past max") {
    val q = df(
      job(7, 101, "pending", "2026-01-10 09:00:00"),
      job(9, 102, "completed", "2026-01-10 09:00:00"))
    val posts = Seq((101L, 3), (103L, 1), (104L, 2)).toDF("post_id", "chunk_count")
    val out = EmbedQueue.enqueue(q, posts, t0)
    assert(out.count() == 4, "post 101 already queued -> skipped")
    val fresh = out.filter($"queued_time" === t0)
      .select("job_id", "post_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fresh == Map(10L -> 103L, 11L -> 104L), "ids continue after max(job_id)=9")
    val st = statusOf(out)
    assert(st(10L)._1 == "pending" && st(11L)._1 == "pending")
  }

  test("enqueue dedups duplicate post_ids WITHIN the batch (one job per post)") {
    val q = df(job(7, 101, "pending", "2026-01-10 09:00:00"))
    val posts = Seq((103L, 1), (103L, 1), (104L, 2)).toDF("post_id", "chunk_count")
    val out = EmbedQueue.enqueue(q, posts, t0)
    assert(out.count() == 3, "duplicate 103 collapses to a single job")
    assert(out.filter($"post_id" === 103L).count() == 1)
  }

  test("Q5: postsToRetry lists retryable-failed posts oldest-first, capped") {
    val q = df(
      job(1, 101, "failed", "2026-01-10 10:00:00", errors = 1),
      job(2, 102, "failed", "2026-01-10 09:00:00", errors = 2),
      job(3, 103, "failed", "2026-01-10 08:00:00", errors = 3), // at maxRetries -> not retryable
      job(4, 104, "pending", "2026-01-10 07:00:00"))
    val got = EmbedQueue.postsToRetry(q).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(102L, 101L), "oldest retryable first; exhausted + pending excluded")
    val capped = EmbedQueue.postsToRetry(q, QueueConfig(retryFetchCap = 1))
      .collect().map(_.getLong(0)).toSeq
    assert(capped == Seq(102L))
  }

  test("T7: adminPage order - status DESC, CASE priority, queued_time DESC") {
    val q = df(
      job(1, 101, "pending", "2026-01-10 09:00:00"),
      job(2, 102, "pending", "2026-01-10 11:00:00"),
      job(3, 103, "processing", "2026-01-10 10:00:00"),
      job(4, 104, "completed", "2026-01-10 10:00:00"),
      job(5, 105, "failed", "2026-01-10 10:00:00"))
    val page = EmbedQueue.adminPage(q, None, page = 1, QueueConfig(pageSize = 10))
      .select("job_id").collect().map(_.getLong(0)).toSeq
    // status string DESC: processing > pending > failed > completed;
    // within equal status, queued_time DESC
    assert(page == Seq(3L, 2L, 1L, 5L, 4L), s"got $page")
  }

  test("Q9: reset returns a post's jobs to pending and clears progress") {
    val q = df(job(1, 101, "failed", "2026-01-10 09:00:00",
      start = Some("2026-01-10 10:00:00"), end = Some("2026-01-10 10:05:00"), errors = 2))
    val r = EmbedQueue.reset(q, 101L)
    val row = r.head()
    assert(row.getAs[String]("status") == "pending")
    assert(row.getAs[Timestamp]("start_time") == null)
    assert(row.getAs[Timestamp]("end_time") == null)
    assert(row.getAs[Int]("error_count") == 0)
    assert(row.getAs[String]("error_message") == null)
  }

  test("Q8: stats one-pass conditional counts") {
    val q = df(
      job(1, 101, "pending", "2026-01-10 09:00:00"),
      job(2, 102, "pending", "2026-01-10 09:00:00"),
      job(3, 103, "failed", "2026-01-10 09:00:00"),
      job(4, 104, "completed", "2026-01-10 09:00:00"))
    val s = EmbedQueue.stats(q).head()
    assert(s.getAs[Long]("total") == 4 && s.getAs[Long]("pending") == 2 &&
      s.getAs[Long]("failed") == 1 && s.getAs[Long]("completed") == 1 &&
      s.getAs[Long]("processing") == 0)
  }

  test("Q8/J6: adminPage joins posts listing columns and paginates") {
    val q = df(
      job(1, 101, "pending", "2026-01-10 09:00:00"),
      job(2, 102, "failed", "2026-01-10 10:00:00"),
      job(3, 103, "pending", "2026-01-10 11:00:00"))
    val posts = Seq((101L, "Post A"), (102L, "Post B")).toDF("ID", "title")
    val page = EmbedQueue.adminPage(q, Some(posts), page = 1, QueueConfig(pageSize = 2))
    val rows = page.select("job_id", "title").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length == 2)
    val titles = page.select("job_id", "title").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    titles.foreach { case (id, t) =>
      if (id == 1L) assert(t == Some("Post A"))
      if (id == 2L) assert(t == Some("Post B"))
      if (id == 3L) assert(t == None, "no posts row -> null listing cols")
    }
  }
}
