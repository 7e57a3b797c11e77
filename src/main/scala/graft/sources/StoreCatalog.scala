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

  private def requireName(name: String): Unit =
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad view name: $name")

  /** SQL-surface a persisted [[InvertedIndex]] (X189): register
    * `<name>_postings` (LIVE postings, `tbucket` kept as the pruning
    * surface — see [[InvertedIndex.livePostings]] for the stock-SQL
    * bucket predicate), `<name>_doclens` (live (doc_id, dl)) and
    * `<name>_vocab` (census-served (term, df)) as session temp views,
    * so `spark.sql` users reach q214-class serving — phrase joins, BM25
    * stats, fuzzy vocab — without the Scala API. Returns the view
    * names.
    *
    * The views snapshot the tombstone EXISTENCE at registration (the
    * [[InvertedIndex]] plan-build-time rule): re-register after
    * delete/vacuum/compact — one call on the maintenance cadence. */
  def registerInvertedIndex(name: String, path: String): Seq[String] = {
    requireName(name)
    val idx = new InvertedIndex(spark, path)
    idx.livePostings.createOrReplaceTempView(s"${name}_postings")
    idx.liveDoclens.createOrReplaceTempView(s"${name}_doclens")
    idx.vocab().createOrReplaceTempView(s"${name}_vocab")
    Seq(s"${name}_postings", s"${name}_doclens", s"${name}_vocab")
  }

  /** SQL-surface a persisted [[IvfIndex]] (X189): register
    * `<name>_lists` (ivf_list-partitioned (id, vector) — a
    * `WHERE ivf_list IN (...)` probe prunes at the file listing exactly
    * like the Scala search) and `<name>_centroids` ((cid, centroid) —
    * the probe-selection input) as session temp views. Score with the
    * registered `vec_cosine` SQL kernel
    * ([[graft.functions.GraftFunctions]]) for bit-parity with the
    * Scala path. Returns the view names. */
  def registerIvfIndex(name: String, path: String): Seq[String] = {
    requireName(name)
    val idx = new IvfIndex(spark, path)
    idx.listsView.createOrReplaceTempView(s"${name}_lists")
    idx.centroidsView.createOrReplaceTempView(s"${name}_centroids")
    Seq(s"${name}_lists", s"${name}_centroids")
  }
}
