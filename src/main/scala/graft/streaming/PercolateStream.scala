package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Streaming percolation (X210 — the serving loop of X208): document
  * files stream in, each micro-batch matches against a FROZEN
  * stored-query table ([[TextAnalysis.percolate]]'s semantics), and the
  * (query_id, doc_id, n_should) matches append to `outDir` — the
  * alerting/routing pipeline shape (saved searches fire as the crawl
  * lands, no index ever built).
  *
  * The clause contract validates ONCE at stream start (the stored-query
  * table is this stream's frozen state — the [[SbStream.freezeTables]]
  * version-pinning discipline; restart the stream to pick up edited
  * alerts), and the clause frame pins executor-side so a micro-batch
  * pays one tokenize pass + one equi-join + one aggregate — stateless
  * per batch, work ∝ batch × matched clause terms.
  *
  * Delivery: the checkpoint gives at-least-once file delivery;
  * exactly-once ON MATCH ROWS comes from the [[IndexIngest]] replay
  * guard shape — arriving ids probe the already-MATCHED output
  * (broadcast semi-join, the batch side never shuffles the output
  * corpus) and drop before re-matching, so a replayed batch (or a
  * crawler re-fetch) never duplicates an alert. A doc that matched
  * nothing leaves no output row and simply re-matches to nothing on
  * replay — idempotent either way. */
object PercolateStream {

  /** One micro-batch's percolation against pre-validated clauses —
    * public so suites (and custom foreachBatch compositions) drive the
    * exact per-batch semantics without a stream. */
  def matchBatch(batch: DataFrame, idCol: String, textCol: String,
      clauses: DataFrame, minShould: Int): DataFrame = {
    val membership = TextAnalysis.positionalPostings(
        batch.dropDuplicates(idCol), idCol, col(textCol))
      .select(col("doc_id"), col("term")).distinct()
    TextAnalysis.booleanMatchBatch(membership, clauses, minShould)
  }

  def start(
      spark: SparkSession,
      docsDir: String,
      checkpointDir: String,
      outDir: String,
      clauses: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minShould: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : StreamingQuery = {
    // validate + freeze the stored-query table at stream start; pinned
    // executor-side, amortized over every micro-batch
    val frozen = TextAnalysis.validateClauseBatch(clauses, minShould)
      .localCheckpoint(true)
    spark.readStream
      .schema(schema.getOrElse(spark.read.parquet(docsDir).schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh = freshDocs(spark, outDir, batch, idCol)
        if (!fresh.isEmpty)
          matchBatch(fresh, idCol, textCol, frozen, minShould)
            .write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Batch rows whose id has no match row yet — the [[SbStream]]
    * freshIds shape against the match output. */
  private def freshDocs(spark: SparkSession, outDir: String,
      batch: DataFrame, idCol: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deduped = batch.dropDuplicates(idCol)
    if (!fs.exists(new org.apache.hadoop.fs.Path(outDir))) deduped
    else {
      val ids = batch.select(col(idCol)).distinct()
      val done = spark.read.parquet(outDir)
        .select(col("doc_id").as(idCol)).distinct()
        .join(broadcast(ids), Seq(idCol), "left_semi")
      deduped.join(broadcast(done), Seq(idCol), "left_anti")
    }
  }
}
