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
              // keep the state even when retry-exhausted: dropping it
              // would let a later claim event re-initialize the post from
              // pending with error_count 0 — the batch path
              // (EmbedQueue.claimable) blocks exactly this. GC parity with
              // EmbedQueue.gc (error_count > maxRetries) applies below.
              if (failed.error_count > cfg.maxRetries) state.remove()
              else state.update(failed)
              Iterator.single(failed)
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
                case "fail" => JobState(postId, Failed.name, s.error_count + 1, e.at)
                case other => throw new IllegalArgumentException(s"bad event kind: $other")
              }
              if (!(next eq s)) out += next
              s = next
            }
            // completed jobs and fails PAST the retry budget leave the
            // store (the in-stream analogue of EmbedQueue.gc, which keeps
            // rows at exactly maxRetries — unclaimable — and deletes only
            // error_count > maxRetries); an explicit enqueue re-opens a
            // post, mirroring the reference's reset_job
            if (s.status == Completed.name ||
                (s.status == Failed.name && s.error_count > cfg.maxRetries)) state.remove()
            else state.update(s)
            out.result().iterator
          }
        })
  }
}
