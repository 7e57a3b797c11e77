package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType, IntegerType, LongType, StringType}

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

  /** Ordered-funnel analysis: for each user, the earliest time they
    * completed each stage prefix of `stages` IN ORDER — stage i+1 counts
    * only strictly AFTER the user's stage-i completion time (the standard
    * conversion-funnel semantics; same-timestamp events do not chain).
    * Returns one row per user who reached stage 1: `user_id`,
    * `t1..tk` (stage completion times, null once the user drops off —
    * nulls are suffix-closed by construction) and `depth` (stages
    * reached).
    *
    * Semantics are a deterministic min-cascade: t1 = MIN ts of stage-1
    * events; t_{i+1} = MIN ts of stage-(i+1) events with ts > t_i. MIN
    * makes the result independent of partitioning and tie order — no
    * window sort, no per-user array materialization (a power user with
    * 10^7 events costs nothing more than their aggregate).
    *
    * Scale shape: ONE exchange keys the events by user; every stage's
    * filter + semi-cascade aggregate and every stage's left join inherit
    * that partitioning, so k stages add zero further corpus shuffles.
    * The per-stage frames shrink monotonically (funnels narrow), and AQE
    * may broadcast them instead — either plan never re-shuffles the raw
    * events.
    *
    * The pinned event slice lives as long as the returned frame: in a
    * long-lived session, `graft.util.Pins.release(result)` after the last
    * consumer has materialized (see [[graft.util.Pins]]). */
  def funnel(events: DataFrame, user: Column, ts: Column, typeCol: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate stage in $stages")
    // pin the 3-column user-partitioned working set ONCE: localCheckpoint
    // preserves the output partitioning, so every stage's filter+aggregate
    // and every cascade join reads the pinned partitions with no further
    // exchange and no repeated source scan (k stages would otherwise
    // re-read the events k+ times under AQE's per-stage broadcasts)
    val ev = events.select(user.as("user_id"), ts.as("__ts"), typeCol.as("__type"))
      .repartition(col("user_id"))
      .localCheckpoint(true)
    var cur = ev.filter(col("__type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("__ts")).as("t1"))
    for (i <- 2 to stages.length) {
      val next = ev.filter(col("__type") === stages(i - 1))
        .join(cur.select(col("user_id"), col(s"t${i - 1}")), Seq("user_id"))
        .filter(col("__ts") > col(s"t${i - 1}"))
        .groupBy(col("user_id")).agg(min(col("__ts")).as(s"t$i"))
      cur = cur.join(next, Seq("user_id"), "left")
    }
    cur.withColumn("depth",
      stages.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast(org.apache.spark.sql.types.IntegerType))
  }

  /** Per-session interaction-trace export: each (user, session) becomes
    * one row with the session's event-type sequence serialized in
    * `(ts, tie)` order (`view>click>purchase`) plus bounds and counts —
    * the behavioral-sequence training-data shape (next-action models,
    * session embeddings) and the session replay a product analyst reads.
    *
    * Determinism: the trace orders by (event-time micros, tie) via an
    * in-group array_sort over collected structs — partition-order-free;
    * the oracle's `string_agg ... ORDER BY` reproduces it exactly.
    *
    * Scale shape: [[assignSessions]]' user exchange feeds the
    * (user, session) aggregation without a second shuffle (sub-key hash
    * clustering); per-group state is the session's OWN events (sessions
    * are gap-bounded and small by construction — unlike unbounded
    * collect_list-per-user). */
  def sessionTraces(events: DataFrame, user: Column, ts: Column, tie: Column,
      typeCol: Column, gapMicros: Long): DataFrame = {
    val sess = assignSessions(events, user, ts, tie, gapMicros)
      .select(user.as("user_id"), col("session_no"), ts.as("__ts"), tie.as("__tie"),
        typeCol.as("__type"))
    sess
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ts")).as("session_start"),
        max(col("__ts")).as("session_end"),
        concat_ws(">",
          transform(
            array_sort(collect_list(struct(unix_micros(col("__ts")).as("t"),
              col("__tie").as("k"), col("__type").as("e")))),
            s => s.getField("e"))).as("trace"))
  }

  /** Weekly cohort-retention triangle: users are cohorted by the ISO week
    * (Monday-truncated) of their FIRST event; each (cohort_week,
    * week_offset) cell counts the cohort's users active in that later
    * week — the standard retention heatmap, and the engagement signal a
    * training pipeline uses to weight interaction data by user stickiness.
    *
    * Scale shape: activity collapses to DISTINCT (user, week) first —
    * everything after runs on user-weeks, not raw events. One exchange
    * keys the collapse by user; the cohort MIN and the activity-cohort
    * join both inherit that partitioning (a sub-key hash satisfies the
    * (user, week) clustering), so only the final cell aggregate — cohort
    * rows, tiny — reshuffles. `cohort_week` is emitted as epoch seconds
    * (BIGINT), the engine's cross-engine timestamp convention. */
  /** OHLC time-bucket profile (X171): per (key, tumbling bucket) the
    * open/high/low/close of a value signal plus count and exact sum —
    * the classic telemetry/metrics downsampling aggregate (a dashboard
    * or anomaly detector reads OHLC candles, not raw events; finance
    * popularized the shape, ops pipelines run it on every counter).
    *
    * Determinism: open/close order by (ts, value) so an exact-timestamp
    * tie resolves by value, not arrival; the sum accumulates in
    * DECIMAL(28,8) (the engine's dsum discipline). Scale shape: ONE
    * (key, bucket) exchange serves both the ordered windows and the
    * final aggregate (sub-key clustering satisfies both — the
    * [[graft.operators.CorpusStats.datasheet]] shape); window state is
    * O(1) per row. Buckets align to the epoch
    * ([[org.apache.spark.sql.functions.window]] tumbling semantics);
    * `bucket_start` is unix seconds. */
  def ohlcBuckets(events: DataFrame, key: Column, ts: Column, value: Column,
      width: String): DataFrame = {
    require(width.nonEmpty, "width must be a window duration, e.g. '10 minutes'")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 8)
    val base = events.select(key.as("key"), ts.as("__t"),
        value.cast("double").as("__v"))
      .withColumn("__b", window(col("__t"), width))
      .repartition(col("key"), col("__b"))
    val w = Window.partitionBy(col("key"), col("__b"))
      .orderBy(col("__t").asc, col("__v").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("__open", first(col("__v")).over(w))
      .withColumn("__close", last(col("__v")).over(full))
      .groupBy(col("key"), col("__b"))
      .agg(count(lit(1)).as("n"),
        max(col("__open")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(col("__close")).as("close"),
        round(sum(col("__v").cast(dec)).cast("double"), 6).as("sum_value"))
      .select(col("key"), unix_timestamp(col("__b.start")).as("bucket_start"),
        col("n"), col("open"), col("high"), col("low"), col("close"),
        col("sum_value"))
  }

  def cohortRetention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val wk = events
      .select(user.as("user_id"), date_trunc("week", ts).as("wk"))
      .repartition(col("user_id"))
      .distinct()
    val cohort = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    // (user, wk) is unique after the collapse and cohort is 1 row/user, so
    // the cell count is a plain count — no distinct aggregation needed
    wk.join(cohort, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7)
          .cast(org.apache.spark.sql.types.IntegerType))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_timestamp(col("cohort_week")).as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Time-to-convert per funnel transition: for each stage i >= 2, the
    * converting users' latency `t_i - t_{i-1}` in microseconds — count,
    * mean (decimal-sum discipline), and exact median (Spark `percentile`,
    * the same linear interpolation as the oracle's quantile_cont). The
    * metric that tells "users stall between click and signup" apart from
    * "users never sign up" ([[funnelCounts]] sees only the latter).
    *
    * Consumes [[funnel]]'s per-user frame; it is pinned once here so the
    * k per-stage slices do not re-run the upstream funnel cascade. */
  def funnelLatency(perUser: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.length >= 2, "latency needs at least two stages")
    val dec = DataTypes.createDecimalType(38, 6)
    val pu = perUser.localCheckpoint(true)
    val legs = (2 to stages.length).map { i =>
      pu.filter(col(s"t$i").isNotNull)
        .select(lit(i).as("stage"), lit(stages(i - 1)).as("stage_name"),
          (unix_micros(col(s"t$i")) - unix_micros(col(s"t${i - 1}")))
            .cast(DoubleType).as("__d"))
    }
    // output in SECONDS: latencies in microseconds reach ~1e11+, where a
    // double's ulp (~3e-5) exceeds the 6-decimal rounding grid and the
    // two engines' round() diverge sub-ulp; at seconds magnitude the
    // grid sits far inside the ulp. The micros sum stays exact decimal;
    // the /1e6 is one IEEE division, identical everywhere.
    legs.reduce(_ unionByName _)
      .groupBy(col("stage"), col("stage_name"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("__d").cast(dec)).cast(DoubleType) / count(lit(1)) / lit(1e6), 6)
          .as("mean_s"),
        round(percentile(col("__d"), lit(0.5)).cast(DoubleType) / lit(1e6), 6)
          .as("p50_s"))
  }

  /** Exponential-decay function score (the Elasticsearch
    * `function_score` exp-decay / "trending now" signal; reference
    * capability level: ranked listings, wp-vector-db.php REST routes):
    * each key's score is the half-life-weighted sum of its event
    * values, `Σ value · 2^(−age/halfLife)`, so recent activity
    * dominates and stale activity fades smoothly instead of falling off
    * a window cliff — the popularity/recency leg a search stack fuses
    * next to text relevance.
    *
    * Determinism: the decay anchor is `max(ts)` over the INPUT (a
    * scalar aggregate broadcast to every row), never the wall clock —
    * same input, same scores, any engine, any day. Per-event weights
    * round at 6 and sum as DECIMAL(38,6) (order-free exact addition —
    * a double sum over an unordered aggregate is not reproducible);
    * `exp`'s argument is built from exact integer microsecond ages and
    * the Scala-printed ln 2 literal so both engines parse identical
    * constants.
    *
    * Scale shape: one map-side-combining aggregation on the key (the
    * single exchange), a broadcast scalar anchor, and a
    * TakeOrderedAndProject heap for the cut — no window, no join. */
  /** Gap-filled date-histogram pipeline aggregations (X236 — the
    * Elasticsearch pipeline-aggregation family over a
    * `min_doc_count: 0` histogram): per tumbling bucket, the event
    * count plus `cumulative_sum`, `derivative` (null for the first
    * bucket, the ES convention) and a trailing `moving_fn` average
    * over `movingW` buckets. EMPTY buckets are filled with zeros
    * first (one `sequence` spine over [min, max] bucket index) —
    * without the fill, derivative and moving averages silently skip
    * time, the classic dashboard bug the ES option exists for.
    *
    * Bucket index = FLOOR(epoch-micros / width), computed as exact
    * integer pmod-adjusted division (no double rounding at bucket
    * boundaries, and — unlike `DIV`, which truncates toward zero —
    * identical to the oracle's floor semantics for PRE-1970 negative
    * timestamps, so boundary rows can never bucket differently in the
    * two engines); bucket_start is unix seconds.
    *
    * The pipeline window is a GLOBAL single-partition window over the
    * BUCKET SERIES — the deliberate bound here is time-range/width (a
    * dashboard's point count: ten years of hourly buckets is 87,600
    * rows), the [[ohlcBuckets]] class of bounded frame, NOT a
    * per-event window — the event mass was already reduced by the
    * map-side-combining count. Callers asking for second-grain buckets
    * over decade ranges (100M+ points — no longer a dashboard) should
    * widen the bucket or slice the time range; the spine build itself
    * stays distributed either way. */
  /** The gap-filled (`min_doc_count: 0`) bucket series shared by the
    * pipeline family: per tumbling `__i` = FLOOR(epoch-micros/width)
    * bucket, the event count, with empty buckets zero-filled over a
    * DISTRIBUTED `spark.range` spine anchored at the one-row (min, max)
    * collect (a `sequence()`-array spine would build the whole series
    * as one row — a decade of 1-second buckets is a 300M-element
    * array). None on an empty input. */
  private def filledBuckets(events: DataFrame, ts: Column,
      widthSeconds: Long): Option[DataFrame] = {
    val wUs = widthSeconds * 1000000L
    val spark = events.sparkSession
    val b = events
      .select(unix_micros(ts).as("__us"))
      .select(expr(s"CAST((__us - pmod(__us, ${wUs}L)) DIV ${wUs}L AS BIGINT)")
        .as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("n"))
    val mmRow = b.agg(min(col("__i")).as("__lo"), max(col("__i")).as("__hi"))
      .head()
    if (mmRow.isNullAt(0)) None
    else {
      val spine = spark.range(mmRow.getLong(0), mmRow.getLong(1) + 1)
        .select(col("id").as("__i"))
      Some(spine.join(b, Seq("__i"), "left").na.fill(0L, Seq("n")))
    }
  }

  def bucketPipeline(events: DataFrame, ts: Column, widthSeconds: Long,
      movingW: Int = 3): DataFrame = {
    require(widthSeconds >= 1, s"widthSeconds must be >= 1, got $widthSeconds")
    require(movingW >= 1, s"movingW must be >= 1, got $movingW")
    val spark = events.sparkSession
    val filledOpt = filledBuckets(events, ts, widthSeconds)
    if (filledOpt.isEmpty)
      return spark.range(0).select(
        col("id").as("bucket_start"), lit(0L).as("n"), lit(0L).as("cum_n"),
        lit(null).cast(LongType).as("derivative"),
        lit(0.0).as("moving_avg"))
    val filled = filledOpt.get
    val w = Window.orderBy(col("__i"))
    filled
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("derivative", col("n") - lag(col("n"), 1).over(w))
      .withColumn("moving_avg", round(avg(col("n")).over(
        w.rowsBetween(-(movingW - 1).toLong, Window.currentRow)), 6))
      .select((col("__i") * widthSeconds).as("bucket_start"), col("n"),
        col("cum_n"), col("derivative"), col("moving_avg"))
  }

  /** Serial differencing (X258 — the ES `serial_diff` pipeline agg):
    * per gap-filled bucket, `n − n[i − lag]` — lag-1 is the
    * [[bucketPipeline]] derivative; seasonal lags (24 for
    * hourly-vs-yesterday, 168 for hourly-vs-last-week) subtract the
    * cycle so trend and anomaly stand out. The first `lag` buckets are
    * null (ES convention — nothing to subtract); empty buckets count 0
    * first, so the lag offset never skips time. Same bounded
    * bucket-series window as [[bucketPipeline]]. */
  def serialDiff(events: DataFrame, ts: Column, widthSeconds: Long,
      lagN: Int): DataFrame = {
    require(widthSeconds >= 1, s"widthSeconds must be >= 1, got $widthSeconds")
    require(lagN >= 1, s"lag must be >= 1, got $lagN")
    val spark = events.sparkSession
    val filledOpt = filledBuckets(events, ts, widthSeconds)
    if (filledOpt.isEmpty)
      return spark.range(0).select(
        col("id").as("bucket_start"), lit(0L).as("n"),
        lit(null).cast(LongType).as("serial_diff"))
    filledOpt.get
      .withColumn("serial_diff",
        col("n") - lag(col("n"), lagN).over(Window.orderBy(col("__i"))))
      .select((col("__i") * widthSeconds).as("bucket_start"), col("n"),
        col("serial_diff"))
  }

  /** Numeric-field histogram (X256 — the ES `histogram` agg, the
    * value-axis sibling of the date_histogram family): per
    * `FLOOR(value/interval)` bucket, the doc_count, empty buckets
    * ZERO-FILLED between the data's min and max bucket (the
    * `min_doc_count: 0` rendering contract — a gapless bar chart).
    * bucket_start = bucket·interval. The floor is the true
    * mathematical floor (negative values bucket down, not toward
    * zero), nulls match no bucket; the spine is the [[bucketPipeline]]
    * distributed-range discipline, bounded by value-range/interval. */
  def valueHistogram(df: DataFrame, value: Column,
      interval: Double): DataFrame = {
    require(interval > 0.0, s"interval must be > 0, got $interval")
    val spark = df.sparkSession
    val b = df
      .select(floor(value.cast(DoubleType) / lit(interval))
        .cast(LongType).as("__i"))
      .filter(col("__i").isNotNull)
      .groupBy(col("__i")).agg(count(lit(1)).as("doc_count"))
    val mmRow = b.agg(min(col("__i")), max(col("__i"))).head()
    if (mmRow.isNullAt(0))
      return spark.range(0).select(
        col("id").cast(DoubleType).as("bucket_start"),
        lit(0L).as("doc_count"))
    spark.range(mmRow.getLong(0), mmRow.getLong(1) + 1)
      .select(col("id").as("__i"))
      .join(b, Seq("__i"), "left").na.fill(0L, Seq("doc_count"))
      .select((col("__i").cast(DoubleType) * lit(interval)).as("bucket_start"),
        col("doc_count"))
  }

  /** Auto-interval date histogram (X267 — the ES `auto_date_histogram`:
    * "give me at most N buckets and pick the interval yourself", the
    * zoom-level negotiation every dashboard widget runs): the width
    * ladder is ES's FIXED-interval subset (1s/5s/10s/30s/1m/5m/10m/30m/
    * 1h/3h/12h/1d/7d — calendar months are out of scope, stated:
    * calendar arithmetic is a timezone policy, not an aggregation), and
    * the chosen width is the SMALLEST whose floor-div bucket count over
    * [min, max] stays ≤ targetBuckets (falling back to 7d when even
    * that overflows — the ES top-rung behavior). Selection needs one
    * (min, max) epoch-micros collect — the bounded scalar anchor — and
    * the series itself is [[bucketPipeline]]'s gap-filled spine at the
    * chosen width. Output (bucket_start, n, width_seconds); the width
    * column makes the negotiated zoom level part of the result, as ES
    * reports `interval`. */
  def autoDateHistogram(events: DataFrame, ts: Column,
      targetBuckets: Int): DataFrame = {
    require(targetBuckets >= 1, s"targetBuckets must be >= 1, got $targetBuckets")
    val spark = events.sparkSession
    val ladder = Seq(1L, 5L, 10L, 30L, 60L, 300L, 600L, 1800L,
      3600L, 10800L, 43200L, 86400L, 604800L)
    val mm = events.select(unix_micros(ts).as("__us"))
      .agg(min(col("__us")), max(col("__us"))).head()
    if (mm.isNullAt(0))
      return spark.range(0).select(col("id").as("bucket_start"),
        lit(0L).as("n"), lit(0L).as("width_seconds"))
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    def bucketsAt(w: Long): Long = {
      val wUs = w * 1000000L
      Math.floorDiv(hiUs, wUs) - Math.floorDiv(loUs, wUs) + 1
    }
    val width = ladder.find(bucketsAt(_) <= targetBuckets)
      .getOrElse(ladder.last)
    filledBuckets(events, ts, width).get
      .select((col("__i") * width).as("bucket_start"), col("n"),
        lit(width).as("width_seconds"))
  }

  /** Calendar-complete auto date histogram (X271 — the month/quarter/
    * year rungs [[autoDateHistogram]] stops short of, completing the
    * full ES `auto_date_histogram` ladder): fixed rungs first (X267's
    * list), then 1M, 3M, 1y, 5y, 10y, 20y, 50y, 100y — the smallest
    * rung whose bucket count over [min, max] fits `targetBuckets`,
    * overflow pinning to the 100y top rung (the ES behavior).
    *
    * TIMEZONE CONTRACT, stated: calendar boundaries are month/year
    * STARTS UNDER THE SESSION TIMEZONE, which this engine pins to UTC
    * everywhere (builder config in every main; the suite asserts it) —
    * "1M" buckets at 2021-03-01T00:00:00Z regardless of where the
    * dashboard viewer sits. DST-shifted local calendars are a render
    * policy, deliberately out of engine scope.
    *
    * Selection needs the same one (min, max) collect as X267 (bucket
    * counts for every rung derive from the two endpoints in driver
    * java.time math — no per-rung scan); the series is one month- or
    * year-keyed aggregate (map-side combined) left-joined onto a
    * `spark.range` spine, zero-filled — gapless, the `min_doc_count:
    * 0` contract. Output (bucket_start TIMESTAMP, n, interval) — the
    * interval string travels in the result like ES's reported
    * `interval`; on a fixed rung the buckets equal [[autoDateHistogram]]
    * bucket-for-bucket with bucket_start = timestamp_seconds(its
    * epoch-seconds start). */
  def autoDateHistogramCalendar(events: DataFrame, ts: Column,
      targetBuckets: Int): DataFrame = {
    require(targetBuckets >= 1, s"targetBuckets must be >= 1, got $targetBuckets")
    val spark = events.sparkSession
    val fixed = Seq("1s" -> 1L, "5s" -> 5L, "10s" -> 10L, "30s" -> 30L,
      "1m" -> 60L, "5m" -> 300L, "10m" -> 600L, "30m" -> 1800L,
      "1h" -> 3600L, "3h" -> 10800L, "12h" -> 43200L, "1d" -> 86400L,
      "7d" -> 604800L)
    val mm = events.select(unix_micros(ts).as("__us"))
      .agg(min(col("__us")), max(col("__us"))).head()
    if (mm.isNullAt(0))
      return spark.range(0).select(
        col("id").cast(DataTypes.TimestampType).as("bucket_start"),
        lit(0L).as("n"), lit("1s").as("interval"))
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    def fixedBucketsAt(w: Long): Long = {
      val wUs = w * 1000000L
      Math.floorDiv(hiUs, wUs) - Math.floorDiv(loUs, wUs) + 1
    }
    fixed.find { case (_, w) => fixedBucketsAt(w) <= targetBuckets } match {
      case Some((label, w)) =>
        return filledBuckets(events, ts, w).get
          .select(timestamp_seconds(col("__i") * w).as("bucket_start"),
            col("n"), lit(label).as("interval"))
      case None => ()
    }
    // calendar rungs: bucket index = floorDiv(months-since-epoch, k) or
    // floorDiv(years-since-epoch, k); counts from the endpoints alone
    val utc = java.time.ZoneOffset.UTC
    def at(us: Long) = java.time.Instant
      .ofEpochSecond(Math.floorDiv(us, 1000000L)).atZone(utc)
    val (loDt, hiDt) = (at(loUs), at(hiUs))
    def monthIdx(d: java.time.ZonedDateTime): Long =
      (d.getYear - 1970L) * 12L + (d.getMonthValue - 1L)
    def yearIdx(d: java.time.ZonedDateTime): Long = d.getYear - 1970L
    val calendar: Seq[(String, Boolean, Long)] = Seq( // (label, isMonth, k)
      ("1M", true, 1L), ("3M", true, 3L), ("1y", false, 1L),
      ("5y", false, 5L), ("10y", false, 10L), ("20y", false, 20L),
      ("50y", false, 50L), ("100y", false, 100L))
    def calBucketsAt(isMonth: Boolean, k: Long): Long = {
      val (lo, hi) = if (isMonth) (monthIdx(loDt), monthIdx(hiDt))
        else (yearIdx(loDt), yearIdx(hiDt))
      Math.floorDiv(hi, k) - Math.floorDiv(lo, k) + 1
    }
    val (label, isMonth, k) = calendar
      .find { case (_, m, kk) => calBucketsAt(m, kk) <= targetBuckets }
      .getOrElse(calendar.last)
    // event-side index under the session (UTC-pinned) calendar; FLOOR of
    // the real division keeps pre-1970 rows bucketing DOWN, not toward 0
    val rawIdx =
      if (isMonth) (year(ts).cast(LongType) - 1970L) * 12L +
        (month(ts).cast(LongType) - 1L)
      else year(ts).cast(LongType) - 1970L
    val b = events
      .select(floor(rawIdx.cast(DoubleType) / lit(k.toDouble))
        .cast(LongType).as("__b"))
      .filter(col("__b").isNotNull)
      .groupBy(col("__b")).agg(count(lit(1)).as("n"))
    val (loB, hiB) = (
      Math.floorDiv(if (isMonth) monthIdx(loDt) else yearIdx(loDt), k),
      Math.floorDiv(if (isMonth) monthIdx(hiDt) else yearIdx(hiDt), k))
    val spine = spark.range(loB, hiB + 1).select(col("id").as("__b"))
    val start =
      if (isMonth) {
        val smi = col("__b") * k // start month-since-epoch of the bucket
        val y = (lit(1970L) + floor(smi.cast(DoubleType) / 12.0)
          .cast(LongType)).cast(IntegerType)
        val m = (pmod(smi, lit(12L)) + 1L).cast(IntegerType)
        make_timestamp(y, m, lit(1), lit(0), lit(0), lit(0))
      } else make_timestamp((lit(1970L) + col("__b") * k).cast(IntegerType),
        lit(1), lit(1), lit(0), lit(0), lit(0))
    spine.join(b, Seq("__b"), "left").na.fill(0L, Seq("n"))
      .select(start.as("bucket_start"), col("n"), lit(label).as("interval"))
  }

  /** Cumulative cardinality (X266 — the ES `cumulative_cardinality`
    * pipeline agg: "total distinct users seen THROUGH each bucket",
    * the growth-curve / new-vs-returning surface): EXACT, and never
    * the naive quadratic union-of-distincts — an entity contributes to
    * the cumulative count from its FIRST bucket onward, so ONE
    * entity-keyed aggregate (min bucket per entity), a per-bucket
    * first-seen count, the zero-filled spine, and the bounded
    * bucket-series cumulative sum reproduce the whole curve; the
    * first-seen counts double as the ES derivative-of-cardinality
    * ("new entities per bucket") for free. Scale shape: the only
    * event-mass exchange is the entity groupBy (map-side combined);
    * everything after is bucket-sized. */
  def cumulativeCardinality(events: DataFrame, ts: Column,
      widthSeconds: Long, entity: Column): DataFrame = {
    require(widthSeconds >= 1, s"widthSeconds must be >= 1, got $widthSeconds")
    val wUs = widthSeconds * 1000000L
    val spark = events.sparkSession
    val firstSeen = events
      .select(entity.as("__e"), unix_micros(ts).as("__us"))
      .filter(col("__e").isNotNull)
      .select(col("__e"),
        expr(s"CAST((__us - pmod(__us, ${wUs}L)) DIV ${wUs}L AS BIGINT)")
          .as("__i"))
      .groupBy(col("__e")).agg(min(col("__i")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("new_entities"))
    val mmRow = firstSeen.agg(min(col("__i")), max(col("__i"))).head()
    if (mmRow.isNullAt(0))
      return spark.range(0).select(
        col("id").as("bucket_start"), lit(0L).as("new_entities"),
        lit(0L).as("cumulative_distinct"))
    // the spine upper bound is the LAST EVENT bucket, not the last
    // first-seen bucket: trailing buckets with only returning entities
    // must still render the flat curve
    val hiRow = events.select(unix_micros(ts).as("__us"))
      .select(expr(s"CAST((__us - pmod(__us, ${wUs}L)) DIV ${wUs}L AS BIGINT)")
        .as("__i"))
      .agg(max(col("__i"))).head()
    val spine = spark.range(mmRow.getLong(0), hiRow.getLong(0) + 1)
      .select(col("id").as("__i"))
    spine.join(firstSeen, Seq("__i"), "left")
      .na.fill(0L, Seq("new_entities"))
      .withColumn("cumulative_distinct",
        sum(col("new_entities")).over(Window.orderBy(col("__i"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select((col("__i") * widthSeconds).as("bucket_start"),
        col("new_entities"), col("cumulative_distinct"))
  }

  /** Bucket sort (X275 — the ES `bucket_sort` pipeline agg): re-order
    * a parent aggregation's bucket frame by metric columns and
    * truncate with `from`/`size` — "the top 5 busiest days, skipping
    * the first" as a pipeline step instead of a driver-side slice.
    * ES leaves ties undefined; an oracle-gated engine cannot, so the
    * total order is the caller's keys THEN every remaining column
    * ascending in frame order (documented, mirrored in SQL as the
    * same ORDER BY tail). Nulls follow Spark's asc-nulls-first /
    * desc-nulls-last defaults, stated. Plan: one
    * TakeOrderedAndProject heap when `size` bounds the output
    * (limit + offset push into the heap — no global sort of the
    * bucket frame), a global sort only in the unbounded-size case
    * (bucket-sized input by the pipeline-agg contract). */
  def bucketSort(buckets: DataFrame, sortKeys: Seq[(String, Boolean)],
      from: Int = 0, size: Option[Int] = None): DataFrame = {
    require(sortKeys.nonEmpty, "no sort keys")
    val missing = sortKeys.map(_._1).filterNot(buckets.columns.contains)
    require(missing.isEmpty, s"sort keys not in the bucket frame: $missing")
    require(sortKeys.map(_._1).distinct.size == sortKeys.size,
      s"duplicate sort key in ${sortKeys.map(_._1)}")
    require(from >= 0, s"from must be >= 0, got $from")
    require(size.forall(_ >= 1), s"size must be >= 1, got $size")
    val named = sortKeys.map(_._1).toSet
    val order = sortKeys.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc } ++
      buckets.columns.filterNot(named).map(col(_).asc)
    val sorted = buckets.orderBy(order: _*)
    val cut = if (from > 0) sorted.offset(from) else sorted
    size.fold(cut)(cut.limit)
  }

  /** Sibling-bucket statistics (X257 — the ES `stats_bucket` /
    * `avg_bucket` / `min_bucket` / `max_bucket` / `sum_bucket`
    * pipeline family in one row): over a (key, metric) bucket frame,
    * the bucket count, min/max/avg/sum of the metric, and the KEYS
    * attaining the extremes (ES's max_bucket returns a keys LIST —
    * ties keep every key, rendered as a comma-joined sorted string so
    * the row stays scalar and deterministic). The sum accumulates in
    * DECIMAL(38,6) (order-free); avg = sum/count rounded 6. One
    * map-side-combining aggregate + two tiny extreme-key aggregates,
    * all over a PINNED base (eager localCheckpoint, the
    * [[graft.util.Pins]] release contract): the stats row has three
    * consumers of the same projection, and a pipeline agg's input is
    * another aggregate's output — unpinned, each consumer would re-run
    * that whole upstream aggregate; pinned, the three jobs read a
    * bucket-sized frame. Cost hygiene, not scale risk (the input is
    * bucket-sized by contract). */
  def bucketStats(buckets: DataFrame, key: Column,
      metric: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 6)
    val base = buckets.select(key.cast(StringType).as("__k"),
      metric.cast(DoubleType).as("__v")).filter(col("__v").isNotNull)
      .localCheckpoint(true)
    // release-on-failure: a throw during construction (plan analysis)
    // must not strand the pin; success keeps the caller-release contract
    try {
      val agg = base.agg(
        count(lit(1)).as("n_buckets"),
        min(col("__v")).as("min_value"), max(col("__v")).as("max_value"),
        sum(col("__v").cast(dec)).as("__sum"))
      val minKeys = base.join(broadcast(agg.select(col("min_value"))),
          col("__v") === col("min_value"))
        .agg(concat_ws(",", sort_array(collect_list(col("__k"))))
          .as("min_keys"))
      val maxKeys = base.join(broadcast(agg.select(col("max_value"))),
          col("__v") === col("max_value"))
        .agg(concat_ws(",", sort_array(collect_list(col("__k"))))
          .as("max_keys"))
      agg.crossJoin(minKeys).crossJoin(maxKeys)
        .select(col("n_buckets"), col("min_value"), col("max_value"),
          round(col("__sum").cast(DoubleType), 6).as("sum_value"),
          round(col("__sum").cast(DoubleType) /
            col("n_buckets").cast(DoubleType), 6).as("avg_value"),
          col("min_keys"), col("max_keys"))
    } catch {
      case t: Throwable => graft.util.Pins.release(base); throw t
    }
  }

  /** Exact linear-interpolated percentiles (X237 — the Elasticsearch
    * `percentiles` aggregation in its exact form; the type-7/R-7
    * quantile definition both engines' native functions implement,
    * spelled RELATIONALLY here so the interpolation arithmetic is
    * engine-identical instead of trusting two sketch/percentile
    * implementations to agree bit-for-bit): per key and requested p,
    * x = (n−1)·p, k = ⌊x⌋, f = x − k, value = v₍ₖ₎ + f·(v₍ₖ₊₁₎ − v₍ₖ₎)
    * over the key's values sorted ascending (equal values make the
    * tie order irrelevant — the picked VALUE is identical either
    * way). Nulls are excluded, the aggregate convention.
    *
    * Plan shape: one per-key sort window for ranks, one per-key count,
    * the (key × p) grid from a broadcast literal frame, and two
    * equi-joins picking the bracketing ranks — no collect, no UDF;
    * scales as a per-key window + k-row joins. Output:
    * (key, p, n, value) with value round-6. */
  def percentilesExact(df: DataFrame, key: Column, value: Column,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "no percentiles requested")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    require(ps.distinct.size == ps.size, s"duplicate percentile in $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(key.as("key"), value.cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
    val ranked = vals.withColumn("__rk", row_number().over(
      Window.partitionBy(col("key")).orderBy(col("__v").asc)))
    val counts = vals.groupBy(col("key")).agg(count(lit(1)).as("n"))
    val grid = counts.crossJoin(broadcast(ps.toDF("p")))
      .withColumn("__x", (col("n") - 1).cast(DoubleType) * col("p"))
      .withColumn("__k", floor(col("__x")).cast(LongType))
      .withColumn("__f", col("__x") - col("__k").cast(DoubleType))
    // BOTH bracketing ranks from ONE join over the ranked frame (the
    // sort window evaluates once, not once per bracket): a row matches
    // when its rank is k+1 or k+2, and a conditional aggregate splits
    // lo from hi — hi absent at the k = n−1 edge (f = 0 there)
    grid
      .join(ranked.select(col("key").as("__rkk"), col("__rk"),
          col("__v")),
        col("key") === col("__rkk") &&
          (col("__rk") === col("__k") + 1 || col("__rk") === col("__k") + 2))
      .groupBy(col("key"), col("p"), col("n"), col("__k"), col("__f"))
      .agg(max(when(col("__rk") === col("__k") + 1, col("__v"))).as("__plo"),
        max(when(col("__rk") === col("__k") + 2, col("__v"))).as("__phi"))
      .select(col("key"), col("p"), col("n"),
        round(col("__plo") + col("__f") *
          (coalesce(col("__phi"), col("__plo")) - col("__plo")), 6)
          .as("value"))
  }

  /** Boxplot aggregation (the ES `boxplot` agg in its exact form —
    * ES ships TDigest approximations; an oracle-gated engine runs
    * [[percentilesExact]]'s type-7 interpolation, the same determinism
    * trade X237 documents): per key the five-number summary — min, q1,
    * q2 (median), q3, max — plus the value count. Pure composition:
    * one percentilesExact pass at p ∈ {0.25, 0.5, 0.75} pivoted to
    * columns, one min/max aggregate joined back; scales exactly as
    * X237 (one per-key rank window + k-row joins). Round-6
    * throughout. */
  def boxplot(df: DataFrame, key: Column, value: Column): DataFrame = {
    val qs = percentilesExact(df, key, value, Seq(0.25, 0.5, 0.75))
      .groupBy(col("key"))
      .agg(max(col("n")).as("n"),
        max(when(col("p") === 0.25, col("value"))).as("q1"),
        max(when(col("p") === 0.5, col("value"))).as("q2"),
        max(when(col("p") === 0.75, col("value"))).as("q3"))
    val mm = df.select(key.as("key"), value.cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("key"))
      .agg(round(min(col("__v")), 6).as("min_value"),
        round(max(col("__v")), 6).as("max_value"))
    qs.join(mm, Seq("key"))
      .select(col("key"), col("n"), col("min_value"),
        col("q1"), col("q2"), col("q3"), col("max_value"))
  }

  /** Median absolute deviation (the ES `median_absolute_deviation`
    * agg, exact form): MAD = median(|x − median(x)|) — the robust
    * dispersion measure a long-tailed latency/length column needs
    * where stddev chases outliers. Two [[percentilesExact]] passes
    * (p = 0.5): the per-key median broadcasts back into the deviation
    * projection (key-cardinality rows — the bounded-broadcast class),
    * then the deviations rank once more. Deviations measure against
    * the ROUND-6 median the first pass EMITS — the published number,
    * so the record is self-consistent and the oracle mirrors the
    * rounding point exactly. Output (key, n, median, mad). */
  def madExact(df: DataFrame, key: Column, value: Column): DataFrame = {
    val med = percentilesExact(df, key, value, Seq(0.5))
      .select(col("key"), col("value").as("median"))
    val dev = df.select(key.as("key"), value.cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
      .join(broadcast(med), Seq("key"))
      .select(col("key"), abs(col("__v") - col("median")).as("__d"))
    percentilesExact(dev, col("key"), col("__d"), Seq(0.5))
      .join(broadcast(med), Seq("key"))
      .select(col("key"), col("n"), col("median"), col("value").as("mad"))
  }

  /** Moving percentiles (the ES `moving_percentiles` pipeline agg, in
    * the exact form this engine runs the whole percentile family —
    * X237's type-7 interpolation instead of ES's TDigest sketches):
    * per gap-filled time bucket, the percentiles of the RAW values in
    * the trailing `windowW` buckets, current included (the
    * [[bucketPipeline]] trailing-window convention). ES slides a
    * window of per-bucket sketches and merges them; the exact analogue
    * is percentiles over the union of the window's values — which is
    * what sketch-merging approximates. A bucket whose trailing window
    * holds NO values emits null (the ES skip rule); a gap bucket
    * inside the data range still emits from its neighbors' values.
    *
    * Scale: each value fans out to ≤ windowW target buckets (a bounded
    * explode — windowW is a chart knob, single digits), then ONE
    * [[percentilesExact]] pass keyed by target bucket; the spine is
    * the distributed-range discipline of the rest of the bucket
    * family. Emits (bucket_start, n — the bucket's own doc count —,
    * p, n_window, value round-6). */
  def movingPercentiles(events: DataFrame, ts: Column, value: Column,
      widthSeconds: Long, windowW: Int, ps: Seq[Double]): DataFrame = {
    require(widthSeconds >= 1, s"widthSeconds must be >= 1, got $widthSeconds")
    require(windowW >= 1 && windowW <= 64,
      s"windowW is a chart knob, [1, 64], got $windowW")
    val spark = events.sparkSession
    import spark.implicits._
    val filledOpt = filledBuckets(events, ts, widthSeconds)
    if (filledOpt.isEmpty)
      return spark.range(0).select(
        col("id").as("bucket_start"), lit(0L).as("n"), lit(0.0).as("p"),
        lit(0L).as("n_window"), lit(null).cast(DoubleType).as("value"))
    val filled = filledOpt.get
    val hi = filled.agg(max(col("__i"))).head().getLong(0)
    val wUs = widthSeconds * 1000000L
    val vals = events
      .select(unix_micros(ts).as("__us"), value.cast(DoubleType).as("__v"))
      .filter(col("__v").isNotNull)
      .select(expr(s"CAST((__us - pmod(__us, ${wUs}L)) DIV ${wUs}L AS BIGINT)")
        .as("__i"), col("__v"))
    val contrib = vals.select(
      explode(sequence(col("__i"),
        least(col("__i") + lit(windowW - 1), lit(hi)))).as("__t"),
      col("__v"))
    val pct = percentilesExact(contrib, col("__t"), col("__v"), ps)
      .select(col("key").as("__i"), col("p"), col("n").as("n_window"),
        col("value"))
    filled.crossJoin(broadcast(ps.toDF("p")))
      .join(pct, Seq("__i", "p"), "left")
      .select((col("__i") * widthSeconds).as("bucket_start"), col("n"),
        col("p"), coalesce(col("n_window"), lit(0L)).as("n_window"),
        col("value"))
  }

  /** Normalize pipeline aggregation (the ES `normalize` agg): rescale
    * a parent aggregation's bucket metric by one of the six ES
    * methods — `rescale_0_1`, `rescale_0_100`, `percent_of_sum`,
    * `mean` ((x−mean)/(max−min)), `zscore`, `softmax` — appended as
    * the `normalized` column (round-6). Degenerate series pin to 0
    * where ES's arithmetic would 0/0 (max = min, zero stddev; a
    * DEFINED answer beats NaN in an oracle-gated engine, stated).
    * Determinism discipline: every cross-bucket reduction that feeds
    * a divisor runs as a round-6 DECIMAL(38,6) sum (order-free — sum,
    * Σx², Σeˣ), mean/variance from the X243 power-sum shape, variance
    * clamped at 0 against float cancellation. Softmax expects
    * score-scale metrics (eˣ of a raw million-count overflows — ES's
    * own hazard, stated). One broadcast one-row stats frame over the
    * bucket-sized input (pipeline-agg contract) — no window, no
    * shuffle. */
  def normalizeBucket(buckets: DataFrame, metric: Column,
      method: String, out: String = "normalized"): DataFrame = {
    val methods = Set("rescale_0_1", "rescale_0_100", "percent_of_sum",
      "mean", "zscore", "softmax")
    require(methods(method), s"unknown method '$method' (one of $methods)")
    require(!buckets.columns.contains(out),
      s"normalizeBucket emits '$out'; rename the existing column first")
    val dec = DataTypes.createDecimalType(38, 6)
    val m = metric.cast(DoubleType)
    // the softmax denominator evaluates ONLY for softmax: e^x of a
    // large metric overflows to Infinity, and under ANSI the decimal
    // cast of Infinity THROWS — a rescale caller must never pay
    // softmax's domain restriction
    val esum =
      if (method == "softmax") sum(round(exp(m), 6).cast(dec))
        .cast(DoubleType)
      else lit(0.0)
    val stats = buckets.agg(
      min(m).as("__min"), max(m).as("__max"),
      sum(round(m, 6).cast(dec)).cast(DoubleType).as("__sum"),
      count(lit(1)).as("__n"),
      sum(round(m * m, 6).cast(dec)).cast(DoubleType).as("__sum2"),
      esum.as("__esum"))
    val x = m
    val mean = col("__sum") / col("__n").cast(DoubleType)
    val range = col("__max") - col("__min")
    val variance = greatest(
      col("__sum2") / col("__n").cast(DoubleType) - mean * mean, lit(0.0))
    val norm = method match {
      case "rescale_0_1" =>
        when(range === 0.0, lit(0.0)).otherwise((x - col("__min")) / range)
      case "rescale_0_100" =>
        when(range === 0.0, lit(0.0))
          .otherwise(lit(100.0) * (x - col("__min")) / range)
      case "percent_of_sum" =>
        when(col("__sum") === 0.0, lit(0.0))
          .otherwise(lit(100.0) * x / col("__sum"))
      case "mean" =>
        when(range === 0.0, lit(0.0)).otherwise((x - mean) / range)
      case "zscore" =>
        when(sqrt(variance) === 0.0, lit(0.0))
          .otherwise((x - mean) / sqrt(variance))
      case "softmax" => exp(x) / col("__esum")
    }
    buckets.crossJoin(broadcast(stats))
      .withColumn(out, round(norm, 6))
      .drop("__min", "__max", "__sum", "__n", "__sum2", "__esum")
  }

  def decayedActivity(events: DataFrame, key: Column, ts: Column,
      value: Column, halfLifeDays: Double, k: Int): DataFrame = {
    require(halfLifeDays > 0, s"half-life must be positive, got $halfLifeDays")
    require(k > 0, s"k must be positive, got $k")
    val dec = DataTypes.createDecimalType(38, 6)
    val negLn2 = -math.log(2.0)
    val hlMicros = halfLifeDays * 86400e6
    val anchor = events.agg(max(unix_micros(ts)).as("__anchor"))
    val weighted = events
      .select(key.as("key"), unix_micros(ts).as("__us"),
        value.cast(DoubleType).as("__v"))
      .crossJoin(broadcast(anchor))
      .withColumn("__w", round(col("__v") * exp(
        lit(negLn2) * (col("__anchor") - col("__us")).cast(DoubleType)
          / lit(hlMicros)), 6))
    weighted
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w").cast(dec)).cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("key").asc)
      .limit(k)
      .select(col("key"), col("n_events"), round(col("score"), 6).as("score"))
  }

  /** The funnel chart: users remaining at each stage. Consumes
    * [[funnel]]'s per-user frame; one tiny aggregate (k counters) and a
    * k-row unpivot — no second pass over the events. */
  def funnelCounts(perUser: DataFrame, stages: Seq[String]): DataFrame = {
    val counters = perUser.agg(
      count(lit(1)).as("c1"),
      (2 to stages.length).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val stacked = stages.indices.map(i =>
      struct(lit(i + 1).as("stage"), lit(stages(i)).as("stage_name"),
        col(s"c${i + 1}").as("n_users")))
    counters.select(explode(array(stacked: _*)).as("s"))
      .select(col("s.stage"), col("s.stage_name"), col("s.n_users"))
  }
}
