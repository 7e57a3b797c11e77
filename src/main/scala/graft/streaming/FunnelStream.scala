package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One clickstream event for funnel tracking. */
final case class FunnelEvent(user_id: Long, event_type: String, at: Timestamp)

/** Emitted whenever a user ADVANCES a stage: `stage` is 1-based,
  * `at` the event time of the advance. */
final case class FunnelProgress(user_id: Long, stage: Int, stage_name: String,
    at: Timestamp)

/** Streaming counterpart of [[graft.operators.Sessionize.funnel]] (X68):
  * real-time conversion tracking with `flatMapGroupsWithState` over the
  * user key. State is a monotone stage pointer + the time it was reached
  * — 16 bytes per user, NO event buffering — and every stage advance is
  * emitted exactly once.
  *
  * Semantics match the batch min-cascade: stage i+1 advances only on an
  * event strictly AFTER (event-time) the user's stage-i time; within a
  * micro-batch, events fold in (at, stage-rank) order, so a same-instant
  * view+click pair advances `view` only — the batch rule. Non-stage event
  * types are ignored without touching state.
  *
  * Out-of-order caveat (the deterministic trade for O(1) state): a
  * LATE-ARRIVING earlier-stage event (crossing micro-batch boundaries out
  * of event-time order) cannot retroactively unlock stages for events
  * already folded — the batch operator over the full log is the
  * authoritative backfill, this tracker is the live view. Late LATER-stage
  * events are handled exactly (the strictly-after check compares event
  * time, not arrival time).
  *
  * State TTL: 16 bytes/user is small but the USER key-space is unbounded —
  * a year-long stream accretes state forever under `NoTimeout`. With
  * `idleHorizonMs` set, the [[graft.streaming.JobTracker]] reaper pattern
  * applies: the input must carry a watermark on `at`, and a user whose
  * last funnel-relevant event time falls `idleHorizonMs` behind the
  * watermark is silently evicted (event-time timeout — deterministic and
  * replayable, unlike processing-time). An evicted user who returns
  * restarts from stage 0 in the live view; the batch funnel over the full
  * log remains the authoritative backfill, so the horizon should be set
  * to the longest conversion window the product cares about live. */
object FunnelStream {

  def track(events: Dataset[FunnelEvent], stages: Seq[String],
      idleHorizonMs: Option[Long] = None): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    require(idleHorizonMs.forall(_ > 0), s"idleHorizonMs must be positive, got $idleHorizonMs")
    val rank = stages.zipWithIndex.toMap // stage name -> 0-based index
    implicit val stateEnc: org.apache.spark.sql.Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val outEnc: org.apache.spark.sql.Encoder[FunnelProgress] =
      Encoders.product[FunnelProgress]
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    val timeoutConf = if (idleHorizonMs.isDefined) GroupStateTimeout.EventTimeTimeout
                      else GroupStateTimeout.NoTimeout

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, timeoutConf)(
        (userId: Long, evs: Iterator[FunnelEvent], state: GroupState[(Int, Long)]) => {
          if (state.hasTimedOut) {
            // idle past the horizon: drop the stage pointer (silent — an
            // eviction is not a funnel transition)
            state.remove()
            Iterator.empty
          } else {
            // (stages reached, event-time ms of the latest advance)
            var (reached, reachedAt) = state.getOption.getOrElse((0, Long.MinValue))
            val out = Seq.newBuilder[FunnelProgress]
            // (at, stage-rank) order makes same-instant pairs fold in stage
            // order — and replay-deterministic (arrival order is not)
            val relevant = evs.toSeq
              .filter(e => rank.contains(e.event_type))
              .sortBy(e => (e.at.getTime, rank(e.event_type)))
            relevant.foreach { e =>
              val r = rank(e.event_type)
              if (r == reached && reached < stages.length &&
                  (reached == 0 || e.at.getTime > reachedAt)) {
                reached += 1
                reachedAt = e.at.getTime
                out += FunnelProgress(userId, reached, stages(r), e.at)
              }
            }
            state.update((reached, reachedAt))
            idleHorizonMs.foreach { horizon =>
              // re-arm off the LAST funnel-relevant activity (reachedAt
              // alone would starve a user who keeps repeating a stage
              // without advancing); clamp above the current watermark —
              // during replay/backfill a batch can legally carry events
              // older than it, and arming below it throws
              val lastSeen = (reachedAt +: relevant.map(_.at.getTime)).max
              state.setTimeoutTimestamp(
                math.max(lastSeen + horizon, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
        })
  }
}
