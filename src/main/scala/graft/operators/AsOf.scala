package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single most
  * recent right row with `right.time <= left.time` within the same key —
  * the temporal join training pipelines use to snapshot state at event
  * time (user features at interaction time, price at trade time).
  *
  * Spark has no native as-of join. The scalable rewrite is NOT a range
  * join (|L|x|R| blowup per key before the filter prunes) but a
  * union + ordered window: tag both sides, union on (key, time), and let
  * each left row pick up the running "last seen" right payload. One
  * shuffle on the key + one per-key sort on (time, side) — the
  * sort-merge shape a 1000-executor cluster wants; window state is a
  * single row regardless of key population, so hot keys stream instead
  * of buffering.
  */
object AsOf {

  /** Left-outer as-of join.
    *
    * @param rightCols right-side payload columns carried to each matched
    *                  left row (null when no right row precedes it)
    * @param tolerance optional maximum staleness: matches older than
    *                  `left.time - tolerance` are nulled out (pass e.g.
    *                  `expr("INTERVAL 1 HOUR")` for timestamps, or a
    *                  numeric delta for numeric time columns)
    *
    * Right rows must be unique per (key, time): pre-aggregate duplicates,
    * otherwise which duplicate wins is nondeterministic.
    * The left frame must not already contain `rightCols` (they'd collide
    * in the output) nor any `__asof_`-prefixed column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightCols, tolerance,
      forward = false)

  /** Forward as-of join (X107): attach the EARLIEST right row with
    * `right.time >= left.time` per key — the "next known value" lookup
    * (label at horizon, next price tick, first event after a treatment).
    * The mirror of [[asofJoin]]: same union+window plan with the per-key
    * sort DESCENDING, so the running "last seen" right row in scan order
    * is exactly the nearest FOLLOWING one; `tolerance` bounds how far
    * ahead a match may be. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, rightCols, tolerance,
      forward = true)

  /** Nearest as-of join (X108): the CLOSER of the backward and forward
    * matches per left row, ties to the backward side (the point-in-time
    * convention: at equal distance, prefer what was already known).
    * The sensor-fusion/feature-alignment join — align each event to the
    * nearest reading either side, bounded by `tolerance` in both
    * directions. ONE exchange on the key with two per-key sorts (ASC for
    * the running previous, DESC for the running next) — still no
    * range-join blowup, window state one row per direction. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    require(rightCols.nonEmpty, "asofJoinNearest needs at least one right payload column")
    require(!rightCols.exists(left.columns.contains),
      s"left frame already has ${rightCols.filter(left.columns.contains).mkString(",")}")
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct((col(rightTime).as("__asof_rt") +:
      rightCols.map(col)).toSeq: _*)
    val rTagged = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))
          .as("__asof_row"),
        rightStruct.as("__asof_match"))
    val lTagged = left.select(col(key).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_side"), leftStruct.as("__asof_row"),
      lit(null).cast(rTagged.schema("__asof_match").dataType).as("__asof_match"))
    val wB = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").desc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = lTagged.unionByName(rTagged)
      .withColumn("__hb", last(col("__asof_match"), ignoreNulls = true).over(wB))
      .withColumn("__hf", last(col("__asof_match"), ignoreNulls = true).over(wF))
    // non-negative distances by construction (hb.rt <= t <= hf.rt)
    val db = col("__asof_t") - col("__hb.__asof_rt")
    val df = col("__hf.__asof_rt") - col("__asof_t")
    val chosen = when(col("__hb").isNull, col("__hf"))
      .when(col("__hf").isNull, col("__hb"))
      .when(db <= df, col("__hb")).otherwise(col("__hf"))
    val picked = both.withColumn("__hit", chosen)
    val fresh = tolerance.fold(picked) { tol =>
      picked.withColumn("__hit",
        when(col("__hit.__asof_rt").between(
          col("__asof_t") - tol, col("__asof_t") + tol), col("__hit")))
    }
    fresh.filter(col("__asof_side") === 1)
      .select((Seq(col("__asof_row.*")) ++
        rightCols.map(c => col(s"__hit.$c").as(c))): _*)
  }

  /** Interpolating as-of join (X170): for each left row, LINEARLY
    * interpolate a right-side signal between its bracketing readings per
    * key — the feature-alignment join when a sampled sensor/metric must
    * be evaluated AT event time rather than held from the last reading
    * (the standard time-series alignment step before joining telemetry
    * to events). Beyond the brackets it degrades gracefully: only a
    * preceding reading → hold it; only a following one → hold that;
    * an exact-time reading → its value verbatim; no readings → null.
    *
    * `leftTime`/`rightTime` must be NUMERIC (cast timestamps to epoch
    * micros first — `unix_micros`; interval arithmetic cannot form the
    * interpolation ratio). Right rows must be unique per (key, time) —
    * the [[asofJoin]] contract; pre-aggregate duplicates.
    *
    * Same scale shape as [[asofJoinNearest]]: ONE exchange on the key,
    * two per-key ordered windows (running previous / running next, one
    * row of state each) — never a range join. Determinism: the
    * interpolation `vb + (vf − vb)·((t − tb)/(tf − tb))` is a pinned
    * double op sequence over exact integer times, round-6 output. */
  def interpolateJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCol: String): DataFrame = {
    require(!left.columns.contains("interp"),
      "left frame already has an 'interp' column")
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(col(rightTime).cast("double").as("__asof_rt"),
      col(valueCol).cast("double").as("__asof_v"))
    val rTagged = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))
          .as("__asof_row"),
        rightStruct.as("__asof_match"))
    val lTagged = left.select(col(key).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_side"), leftStruct.as("__asof_row"),
      lit(null).cast(rTagged.schema("__asof_match").dataType).as("__asof_match"))
    val wB = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").desc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = lTagged.unionByName(rTagged)
      .withColumn("__hb", last(col("__asof_match"), ignoreNulls = true).over(wB))
      .withColumn("__hf", last(col("__asof_match"), ignoreNulls = true).over(wF))
    val t = col("__asof_t").cast("double")
    val tb = col("__hb.__asof_rt"); val vb = col("__hb.__asof_v")
    val tf = col("__hf.__asof_rt"); val vf = col("__hf.__asof_v")
    val interp = when(col("__hb").isNull && col("__hf").isNull, lit(null))
      .when(col("__hb").isNull, vf)
      .when(col("__hf").isNull, vb)
      .when(tf === tb, vb)
      .otherwise(vb + (vf - vb) * ((t - tb) / (tf - tb)))
    both.filter(col("__asof_side") === 1)
      .withColumn("interp", round(interp, 6))
      .select(col("__asof_row.*"), col("interp"))
  }

  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Column], forward: Boolean): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right payload column")
    require(!rightCols.exists(left.columns.contains),
      s"left frame already has ${rightCols.filter(left.columns.contains).mkString(",")}")

    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    // the matched right row travels as ONE struct (time + payloads): a
    // null inside a payload column must NOT make the window's ignoreNulls
    // fall back to an older right row — that would return stale values and
    // could even stitch different right rows together per column. A null
    // KEY or null TIME right row can never match under equi+<= semantics
    // (mirrors SQL ASOF JOIN), so those are filtered, which also keeps
    // null-key LEFT rows unmatched (their window partition has no right
    // rows).
    val rightStruct = struct((col(rightTime).as("__asof_rt") +:
      rightCols.map(col)).toSeq: _*)
    val rTagged = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(col(key).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))
          .as("__asof_row"),
        rightStruct.as("__asof_match"))
    val lTagged = left.select(col(key).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_side"), leftStruct.as("__asof_row"),
      lit(null).cast(rTagged.schema("__asof_match").dataType).as("__asof_match"))

    // right rows (side 0) sort BEFORE left rows at the same instant, so a
    // right row exactly at left.time matches (inclusive <= / >=). Forward
    // direction = the same scan over time DESCENDING: "last seen" right
    // row becomes the nearest FOLLOWING one.
    val timeOrd = if (forward) col("__asof_t").desc else col("__asof_t").asc
    val w = Window.partitionBy(col("__asof_k"))
      .orderBy(timeOrd, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__asof_hit", last(col("__asof_match"), ignoreNulls = true).over(w))
    val fresh = tolerance.fold(carried) { tol =>
      val inTol =
        if (forward) col("__asof_hit.__asof_rt") <= col("__asof_t") + tol
        else col("__asof_hit.__asof_rt") >= col("__asof_t") - tol
      carried.withColumn("__asof_hit", when(inTol, col("__asof_hit")))
    }
    fresh.filter(col("__asof_side") === 1)
      .select((Seq(col("__asof_row.*")) ++
        rightCols.map(c => col(s"__asof_hit.$c").as(c))): _*)
  }
}
