package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.QueueConfig

/** One job-state event: kind ∈ {enqueue, claim, complete, fail}. */
final case class JobEvent(post_id: Long, kind: String, at: Timestamp)

/** Tracked per-post job state (the queue row's state-machine core). */
final case class JobState(post_id: Long, status: String, error_count: Int,
    since: Timestamp, timed_out: Boolean = false)

/** The queue state machine as Structured Streaming custom state
  * (`flatMapGroupsWithState` over post_id) — the idiomatic-Spark form of
  * the reference's polled table updates (`src/VectorTableQueue.php:
  * 184-331`), with the 15-minute processing reaper expressed as an
  * EVENT-TIME STATE TIMEOUT instead of a sweep query: when the watermark
  * passes `start_time + timeout`, the state times out and the tracker
  * emits the failed transition exactly once. Event-time (not
  * processing-time) makes the reaper deterministic and replayable.
  */
object JobTracker {
  import graft.model.JobStatus._

  /** `events` must carry a watermark on `at` (the caller picks lateness).
    * Emits every state transition, including reaper timeouts. */
  def track(events: Dataset[JobEvent], cfg: QueueConfig = QueueConfig()): Dataset[JobState] = {
    val timeoutMs = cfg.processingTimeoutMinutes * 60000L
    val retentionMs = cfg.completedRetentionDays * 86400000L
    implicit val stateEnc: org.apache.spark.sql.Encoder[JobState] = Encoders.product[JobState]
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong

    events
      .groupByKey(_.post_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (postId: Long, evs: Iterator[JobEvent], state: GroupState[JobState]) => {
          if (state.hasTimedOut) {
            // The armed timestamp cannot be un-set once armed, so the
            // callback re-checks the state: only a job STILL processing is
            // reaped (VectorTableQueue.php:313-324 filters on status too);
            // a completed/failed job's stale timeout is a no-op.
            val s = state.get
            if (s.status == Processing.name) {
              // the transition instant is the watermark that fired the
              // timeout (deterministic under replay)
              val failed = JobState(postId, Failed.name, s.error_count + 1,
                new Timestamp(state.getCurrentWatermarkMs()), timed_out = true)
              state.update(failed)
              // keep exhausted state (unclaimable — dropping it would let
              // a later claim re-initialize the post from pending with
              // error_count 0), but bound the state store: expire it after
              // the retention window, like the batch gc eventually drops
              // dead rows
              if (failed.error_count >= cfg.maxRetries)
                state.setTimeoutTimestamp(
                  math.max(state.getCurrentWatermarkMs() + retentionMs,
                    state.getCurrentWatermarkMs() + 1))
              Iterator.single(failed)
            } else if (s.status == Failed.name && s.error_count >= cfg.maxRetries) {
              // retention expiry of a retry-exhausted post: silent removal
              state.remove()
              Iterator.empty
            } else Iterator.empty
          } else {
            var s = state.getOption.getOrElse(JobState(postId, Pending.name, 0,
              new Timestamp(0L)))
            val out = Seq.newBuilder[JobState]
            // deterministic order under replay: same-timestamp events
            // tie-break on the causal kind rank (shuffle arrival order is
            // not stable across a checkpoint recovery)
            val kindRank = Map("enqueue" -> 0, "claim" -> 1, "complete" -> 2, "fail" -> 3)
            evs.toSeq.sortBy(e => (e.at.getTime, kindRank.getOrElse(e.kind, 9))).foreach { e =>
              val next = e.kind match {
                case "enqueue" => JobState(postId, Pending.name, 0, e.at)
                case "claim"
                    if s.status == Failed.name && s.error_count >= cfg.maxRetries =>
                  // retry-exhausted: unclaimable, same rule as the batch
                  // path's EmbedQueue.claimable — without this a claim
                  // would resurrect the post past its retry budget
                  s
                case "claim" =>
                  // arm the reaper: time out when event time passes
                  // start_time + processing timeout. Clamp to above the
                  // current eviction watermark: during replay/backfill a
                  // batch can legally contain events far older than the
                  // watermark, and setTimeoutTimestamp below it throws and
                  // kills the query.
                  state.setTimeoutTimestamp(
                    math.max(e.at.getTime + timeoutMs, state.getCurrentWatermarkMs() + 1))
                  JobState(postId, Processing.name, s.error_count, e.at)
                case "complete" => JobState(postId, Completed.name, s.error_count, e.at)
                case "fail" if s.status != Processing.name =>
                  // only a processing job can fail (batch EmbedQueue.fail
                  // filters on status too) — this also makes redelivered
                  // fail events from an at-least-once source idempotent,
                  // so error_count can never be pushed past the budget by
                  // duplicates and resurrect the post via state removal
                  s
                case "fail" =>
                  val f = JobState(postId, Failed.name, s.error_count + 1, e.at)
                  // exhausted: unclaimable from here on; bound the state
                  // store by expiring it after the retention window
                  if (f.error_count >= cfg.maxRetries)
                    state.setTimeoutTimestamp(
                      math.max(e.at.getTime + retentionMs,
                        state.getCurrentWatermarkMs() + 1))
                  f
                case other => throw new IllegalArgumentException(s"bad event kind: $other")
              }
              if (!(next eq s)) out += next
              s = next
            }
            // completed jobs leave the store immediately; retry-exhausted
            // fails stay (unclaimable) until their retention timeout
            // expires them — an explicit enqueue re-opens a post either
            // way, mirroring the reference's reset_job
            if (s.status == Completed.name) state.remove()
            else state.update(s)
            out.result().iterator
          }
        })
  }
}
