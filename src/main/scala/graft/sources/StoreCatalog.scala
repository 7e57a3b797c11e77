package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

import graft.model.Embedding

/** S11 DDL surface (`src/VectorTable.php:464-513` CREATE/DROP/SHOW TABLES,
  * queue DDL `src/VectorTableQueue.php:53-92`), expressed against the Spark
  * catalog instead of raw paths: `CREATE TABLE ... USING parquet` registers
  * the store so plain `spark.sql` / `spark.table` sees it, `tableExists`
  * replaces `SHOW TABLES LIKE`, and drop removes metadata and (optionally)
  * data. Path-only stores keep working — the catalog layer is additive.
  */
final class StoreCatalog(spark: SparkSession) {

  /** CREATE TABLE IF NOT EXISTS over an existing store path. The schema is
    * the store's fixed DDL schema (Embedding.schema + the bucket partition
    * column discovered from the layout). */
  def createTable(name: String, path: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad table name: $name")
    // escape quotes: the path is interpolated into single-quoted SQL and
    // must not be able to splice into the statement
    val safePath = path.replace("'", "''")
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$safePath'")
  }

  /** SHOW TABLES LIKE equivalent (`VectorTable.php:506-513`). */
  def tableExists(name: String): Boolean = spark.catalog.tableExists(name)

  /** DROP TABLE IF EXISTS (`VectorTable.php:497-501`); `purge` also deletes
    * the backing files, matching MySQL's drop semantics — default false
    * because external-table drops in Spark conventionally keep data. */
  def dropTable(name: String, purge: Boolean = false): Unit = {
    if (!tableExists(name)) return
    val loc =
      if (purge) Some(spark.sql(s"DESCRIBE TABLE EXTENDED $name")
        .filter("col_name = 'Location'").select("data_type").collect()
        .headOption.map(_.getString(0)))
      else None
    spark.sql(s"DROP TABLE IF EXISTS $name")
    loc.flatten.foreach { l =>
      val p = new Path(l)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** The reference's fixed DDL schema for documentation/validation. */
  def embeddingSchema = Embedding.schema
}
