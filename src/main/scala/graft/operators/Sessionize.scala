package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-session assignment over an event stream — the classic
  * gaps-and-islands operator: a new session starts when the gap to the
  * user's previous event exceeds `gapMicros`. Sessionization feeds
  * engagement analytics and the per-user event grouping a training
  * pipeline uses to build interaction traces.
  *
  * Scale shape: both window passes (the lag flag and the running
  * session number) share one partitioning+ordering, so the plan is a
  * single exchange on the user key and a single sort — the second
  * window reuses the first's sort order. Timestamps are compared in
  * integer microseconds (no floating point, no timezone arithmetic), so
  * a SQL oracle reproduces session boundaries exactly.
  *
  * Streaming: [[streamingSessionStats]] is the same semantics as a
  * watermarked `session_window` aggregation — Spark merges
  * gap-extending windows in the state store and emits a session once
  * the watermark passes its close.
  */
object Sessionize {

  /** Tag each event with its session number (per user, starting at 1,
    * in `(ts, tie)` order). `tie` must make the per-user order total
    * (e.g. a unique event id) — session NUMBERING is already stable
    * under ties (a zero-gap event never opens a session), but lag needs
    * a deterministic order for replayed plans to agree bit-for-bit. */
  def assignSessions(events: DataFrame, user: Column, ts: Column, tie: Column,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, s"session gap must be positive, got $gapMicros")
    require(!events.columns.contains("session_no"),
      "assignSessions emits a 'session_no' column; rename the existing one first")
    require(!events.columns.contains("__new_session"),
      "assignSessions uses '__new_session' internally; rename the existing one first")
    val ord = Window.partitionBy(user).orderBy(ts.asc, tie.asc)
    val tus = unix_micros(ts)
    events
      .withColumn("__new_session",
        when(lag(tus, 1).over(ord).isNull || tus - lag(tus, 1).over(ord) > gapMicros,
          1L).otherwise(0L))
      .withColumn("session_no",
        sum(col("__new_session"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** Watermarked streaming session aggregation: one row per closed
    * session with its bounds and event count. State is bounded by the
    * watermark — sessions still open past the lateness horizon are
    * emitted and dropped, exactly the bound an endless clickstream
    * needs. */
  def streamingSessionStats(events: DataFrame, user: Column, tsCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("session"), user.as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"))
}
