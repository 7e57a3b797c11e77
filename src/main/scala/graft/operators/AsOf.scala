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
      tolerance: Option[Column] = None): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right payload column")
    require(!rightCols.exists(left.columns.contains),
      s"left frame already has ${rightCols.filter(left.columns.contains).mkString(",")}")

    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val lTagged = left.select(
      (Seq(col(key).as("__asof_k"), col(leftTime).as("__asof_t"),
        lit(1).as("__asof_side"), leftStruct.as("__asof_row")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rTagged = right.select(
      (Seq(col(key).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_side"),
        lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))
          .as("__asof_row")) ++
        rightCols.map(col)): _*)

    // right rows (side 0) sort BEFORE left rows at the same instant, so a
    // right row exactly at left.time matches (inclusive <=)
    val w = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t").asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("__asof_mt",
        last(when(col("__asof_side") === 0, col("__asof_t")), ignoreNulls = true).over(w))
    val matched = rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, last(when(col("__asof_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    val fresh = tolerance.fold(matched) { tol =>
      rightCols.foldLeft(matched) { (df, c) =>
        df.withColumn(c, when(col("__asof_mt") >= col("__asof_t") - tol, col(c)))
      }
    }
    fresh.filter(col("__asof_side") === 1)
      .select((Seq(col("__asof_row.*")) ++ rightCols.map(col)): _*)
  }
}
