package graft.sources

import org.apache.spark.sql.DataFrame

/** Co-located storage for repeated large⨝large joins.
  *
  * Two tables bucketed by the join key into the same bucket count join
  * WITHOUT an exchange: SortMergeJoin reads bucket i of one table against
  * bucket i of the other. At 100 TB this turns the recurring fact⨝fact
  * join's full shuffle into a storage-layout property paid once at write
  * time — the bucketed analogue of the engine's hash-bucketed embedding
  * store. Bucketed writes must go through the catalog (`bucketBy` requires
  * `saveAsTable`); readers use `spark.table(name)`.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad table name: $table")
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, key)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }
}
