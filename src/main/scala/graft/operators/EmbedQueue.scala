package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.QueueConfig

/** The reference's polling job queue (`src/VectorTableQueue.php`,
  * SURVEY.md §2.10) as pure, set-oriented DataFrame transforms.
  *
  * Every operation is a function `queue DataFrame -> DataFrame` (no hidden
  * state); the caller owns persistence (atomic parquet swap, or a streaming
  * checkpoint via [[graft.streaming.QueueStream]]). Unlike the reference's
  * two-statement non-atomic claim (`VectorTableQueue.php:189-223`, a
  * double-claim race under concurrency), a claim here is one deterministic
  * transform of the queue state — the caller's swap/checkpoint provides the
  * atomicity the reference lacks.
  *
  * All clock-dependent operations take `now` explicitly (injected clock —
  * testable, and replayable in streaming).
  */
object EmbedQueue {
  import graft.model.JobStatus._

  /** Retryable-failed predicate (`error_count < 3`, VectorTableQueue.php:194). */
  def retryable(cfg: QueueConfig = QueueConfig()): Column =
    col("status") === Failed.name && col("error_count") < cfg.maxRetries

  /** Claim eligibility (the SELECT's WHERE, VectorTableQueue.php:192-194):
    * pending, or failed with retries left. Completed / processing /
    * retry-exhausted rows must never be claimed. */
  def claimable(cfg: QueueConfig = QueueConfig()): Column =
    col("status") === Pending.name || retryable(cfg)

  /** Claim priority (VectorTableQueue.php:195-202): pending first, then
    * retryable failed, then queued_time ASC; job_id tiebreak for
    * determinism. */
  def claimOrder(cfg: QueueConfig = QueueConfig()): Seq[Column] = Seq(
    when(col("status") === Pending.name, 0)
      .when(retryable(cfg), 1)
      .otherwise(2).asc,
    col("queued_time").asc,
    col("job_id").asc)

  /** The batch the next claim would take (SELECT half of Q3). */
  def nextBatch(queue: DataFrame, cfg: QueueConfig = QueueConfig()): DataFrame =
    queue
      .filter(claimable(cfg))
      .orderBy(claimOrder(cfg): _*)
      .limit(cfg.claimBatchSize)

  /** Claim: flip the batch to processing + stamp start_time (UPDATE half of
    * Q3) — one transform over the whole state. Returns (new queue state,
    * picked job ids): the id frame is the authoritative handle to what was
    * claimed — identifying claimed rows by `start_time === now` would
    * conflate pre-existing processing rows whose start_time happens to
    * equal the injected instant. */
  def claimBatch(queue: DataFrame, now: Timestamp,
      cfg: QueueConfig = QueueConfig()): (DataFrame, DataFrame) = {
    val picked = nextBatch(queue, cfg).select(col("job_id"))
    val newState = queue
      .join(broadcast(picked.withColumnRenamed("job_id", "__claimed")),
        queue("job_id") === col("__claimed"), "left")
      .withColumn("status",
        when(col("__claimed").isNotNull, Processing.name).otherwise(col("status")))
      .withColumn("start_time",
        when(col("__claimed").isNotNull, lit(now)).otherwise(col("start_time")))
      .drop("__claimed")
    (newState, picked)
  }

  /** Claim, state only (see [[claimBatch]] for the picked-id handle). */
  def claim(queue: DataFrame, now: Timestamp, cfg: QueueConfig = QueueConfig()): DataFrame =
    claimBatch(queue, now, cfg)._1

  /** Q4 complete: mark done + end_time (VectorTableQueue.php:236-244). */
  def complete(queue: DataFrame, postIds: Seq[Long], now: Timestamp): DataFrame =
    queue
      .withColumn("end_time",
        when(col("post_id").isin(postIds: _*) && col("status") === Processing.name, lit(now))
          .otherwise(col("end_time")))
      .withColumn("status",
        when(col("post_id").isin(postIds: _*) && col("status") === Processing.name, Completed.name)
          .otherwise(col("status")))

  /** Q4 fail: status=failed, end_time, error_count+1, message — columnar
    * instead of the reference's per-row read-modify-write
    * (VectorTableQueue.php:250-267). */
  def fail(queue: DataFrame, postIds: Seq[Long], now: Timestamp, message: String): DataFrame = {
    val hit = col("post_id").isin(postIds: _*) && col("status") === Processing.name
    queue
      .withColumn("end_time", when(hit, lit(now)).otherwise(col("end_time")))
      .withColumn("error_count", when(hit, col("error_count") + 1).otherwise(col("error_count")))
      .withColumn("error_message", when(hit, lit(message)).otherwise(col("error_message")))
      .withColumn("status", when(hit, Failed.name).otherwise(col("status")))
  }

  /** Q6 timeout reaper (VectorTableQueue.php:313-324): processing > 15 min
    * with no end_time -> failed, error_count+1. */
  def reapTimeouts(queue: DataFrame, now: Timestamp, cfg: QueueConfig = QueueConfig()): DataFrame = {
    val cutoff = new Timestamp(now.getTime - cfg.processingTimeoutMinutes * 60000L)
    val hit = col("status") === Processing.name && col("end_time").isNull &&
      col("start_time") < lit(cutoff)
    queue
      .withColumn("error_count", when(hit, col("error_count") + 1).otherwise(col("error_count")))
      .withColumn("error_message",
        when(hit, lit("processing timeout")).otherwise(col("error_message")))
      .withColumn("status", when(hit, Failed.name).otherwise(col("status")))
  }

  /** Q7 GC (VectorTableQueue.php:326-331): drop completed older than 3 days
    * and failed beyond max retries (NB reference uses `error_count > 3`,
    * i.e. a job can sit at exactly 3 forever — replicated). */
  def gc(queue: DataFrame, now: Timestamp, cfg: QueueConfig = QueueConfig()): DataFrame = {
    val cutoff = new Timestamp(now.getTime - cfg.completedRetentionDays * 86400000L)
    queue.filter(!(
      (col("status") === Completed.name && col("end_time") < lit(cutoff)) ||
      (col("status") === Failed.name && col("error_count") > cfg.maxRetries)))
  }

  /** Q5 retry list (capped 25k, VectorTableQueue.php:339-350). */
  def postsToRetry(queue: DataFrame, cfg: QueueConfig = QueueConfig()): DataFrame =
    queue.filter(retryable(cfg))
      .orderBy(col("queued_time").asc, col("job_id").asc)
      .limit(cfg.retryFetchCap)
      .select(col("post_id"))

  /** Q8 stats: one pass over the state instead of the reference's five
    * separate COUNT queries (VectorTableQueue.php:293-303). */
  def stats(queue: DataFrame): DataFrame =
    queue.agg(
      count(lit(1)).as("total"),
      count(when(col("status") === Pending.name, 1)).as("pending"),
      count(when(col("status") === Processing.name, 1)).as("processing"),
      count(when(col("status") === Completed.name, 1)).as("completed"),
      count(when(col("status") === Failed.name, 1)).as("failed"))

  /** Q8 admin listing page (VectorTableQueue.php:403-437): queue LEFT JOIN
    * posts for the listing columns (`:414-415`, J6), then status DESC, CASE
    * priority pending<completed<failed<processing, queued_time DESC,
    * offset/limit pagination (T7+T9). `posts` is expected to be the small
    * slice of post columns the listing shows — broadcast. */
  def adminPage(queue: DataFrame, posts: Option[DataFrame] = None, page: Int = 1,
      cfg: QueueConfig = QueueConfig()): DataFrame = {
    val joined = posts.fold(queue) { p =>
      queue.join(broadcast(p.withColumnRenamed("ID", "__post_ID")),
        queue("post_id") === col("__post_ID"), "left").drop("__post_ID")
    }
    joined
      .orderBy(
        col("status").desc,
        when(col("status") === Pending.name, 0)
          .when(col("status") === Completed.name, 1)
          .when(col("status") === Failed.name, 2)
          .otherwise(3).asc,
        col("queued_time").desc,
        col("job_id").asc)
      .offset((page - 1) * cfg.pageSize)
      .limit(cfg.pageSize)
  }

  /** Q9 reset job back to pending (VectorTableQueue.php:358-374). */
  def reset(queue: DataFrame, postId: Long): DataFrame = {
    val hit = col("post_id") === postId
    queue
      .withColumn("status", when(hit, Pending.name).otherwise(col("status")))
      .withColumn("start_time", when(hit, lit(null).cast("timestamp")).otherwise(col("start_time")))
      .withColumn("end_time", when(hit, lit(null).cast("timestamp")).otherwise(col("end_time")))
      .withColumn("error_count", when(hit, lit(0)).otherwise(col("error_count")))
      .withColumn("error_message", when(hit, lit(null).cast("string")).otherwise(col("error_message")))
  }

  /** Q9 delete by post id. (The reference's delete-by-record-id filters a
    * nonexistent `id` column — `VectorTableQueue.php:393` vs schema `:78`,
    * a latent bug; we expose job_id delete with the correct column.) */
  def deleteByPost(queue: DataFrame, postId: Long): DataFrame =
    queue.filter(col("post_id") =!= postId)

  def deleteByJob(queue: DataFrame, jobId: Long): DataFrame =
    queue.filter(col("job_id") =!= jobId)

  /** Q1/Q2 enqueue batch: append rows as pending. Dedup against already
    * queued posts matches the single-enqueue guard (VectorTableQueue.php:104;
    * the reference's *batch* insert skips the guard — asymmetry documented,
    * we guard both). */
  def enqueue(queue: DataFrame, posts: DataFrame, now: Timestamp): DataFrame = {
    val maxId = queue.agg(coalesce(max(col("job_id")), lit(0L))).first().getLong(0)
    // guard against BOTH duplicate sources: posts already queued (anti
    // join) AND duplicate post_ids inside this batch (a retried ingest
    // unioned with itself would otherwise get one job per occurrence).
    // The within-batch pick is the lexicographically-greatest row — a
    // DETERMINISTIC choice (dropDuplicates keeps whichever row a
    // partition scan meets first, which varies run to run)
    val others = posts.columns.filterNot(_ == "post_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("post_id")).orderBy(others.map(col(_).desc_nulls_last).toSeq: _*)
    val inBatch =
      if (others.isEmpty) posts.dropDuplicates("post_id")
      else posts.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    val deduped = inBatch
      .join(queue.select(col("post_id")), Seq("post_id"), "left_anti")
    // job_id via DenseIds (range partition + zipWithIndex), not a global
    // window: bulk enqueue is an ingest path and must not funnel through
    // one partition (SERIAL replacement, VectorTableQueue.php:78)
    val fresh = graft.util.DenseIds.assign(deduped, "job_id", maxId + 1, col("post_id"))
      .withColumn("status", lit(graft.model.JobStatus.Pending.name))
      .withColumn("queued_time", lit(now))
      .withColumn("start_time", lit(null).cast("timestamp"))
      .withColumn("end_time", lit(null).cast("timestamp"))
      .withColumn("error_count", lit(0))
      .withColumn("error_message", lit(null).cast("string"))
    queue.unionByName(fresh.select(queue.columns.map(col).toSeq: _*))
  }
}
