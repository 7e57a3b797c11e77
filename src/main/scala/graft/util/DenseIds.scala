package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed dense-id assignment (the AUTO_INCREMENT replacement,
  * reference `src/VectorTable.php:470` / `src/VectorTableQueue.php:78`).
  *
  * A global `Window.orderBy(...)` funnels every row through a single
  * partition — fine at sandbox scale, a scale-killer for bulk ingest at
  * 100 TB. Instead: range-repartition on the sort key (distributed sort,
  * all partitions in parallel), sort within partitions, then
  * `zipWithIndex` — which computes ONE count per partition and turns it
  * into per-partition offsets (a tiny driver-side scan), so ids are dense,
  * globally ordered by the sort key, and no task ever sees more than its
  * own partition.
  */
object DenseIds {

  /** Append `idCol` = startAt, startAt+1, ... in `sortCols` order. */
  def assign(df: DataFrame, idCol: String, startAt: Long, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val ordered = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = ordered.schema.add(StructField(idCol, LongType, nullable = false))
    val withId = ordered.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    spark.createDataFrame(withId, schema)
  }
}
