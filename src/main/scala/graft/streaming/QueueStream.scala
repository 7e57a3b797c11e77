package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{QueueConfig, QueueJob}
import graft.operators.EmbedQueue

/** Structured-Streaming shape of the reference's polled embed queue
  * (SURVEY.md §2.10): a file source of embed-requests drives micro-batches;
  * each micro-batch IS the claim (the checkpoint provides the atomic,
  * exactly-once bookkeeping the reference's two-statement claim lacks,
  * `src/VectorTableQueue.php:189-223`).
  *
  * The batch-mode operators in [[graft.operators.EmbedQueue]] remain the
  * reaper/GC/stats utilities over the persisted queue state.
  */
object QueueStream {

  /** Stream of embed requests (parquet files of QueueJob-shaped rows
    * appearing under `requestDir`) processed in claim-sized micro-batches.
    *
    * `process` receives (claimedBatch, batchId) — the embedding work
    * (compute derived columns, upsert into the store) goes there.
    */
  def start(
      spark: SparkSession,
      requestDir: String,
      checkpointDir: String,
      cfg: QueueConfig = QueueConfig())(
      process: (DataFrame, Long) => Unit): StreamingQuery = {

    val requests = spark.readStream
      .schema(QueueJob.schema)
      .option("maxFilesPerTrigger", 1) // claim-sized ingestion
      .parquet(requestDir)

    requests.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The checkpoint marks every file of this micro-batch consumed, so
        // every CLAIMABLE row must be processed here — capping at
        // claimBatchSize and discarding the rest would silently drop jobs
        // (the reference's poll loop leaves unclaimed rows pending for the
        // next poll, VectorTableQueue.php:184-223). Ineligible rows
        // (completed / processing / retry-exhausted, the SELECT's WHERE at
        // :192-194) are excluded up front: replayed terminal state must
        // not be re-embedded. Claim-sized chunks are then carved out of
        // the eligible set in priority order, each handed to `process`.
        val ordered = batch
          .filter(EmbedQueue.claimable(cfg))
          .withColumn("__chunk",
            floor((row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(EmbedQueue.claimOrder(cfg): _*)) - 1) / cfg.claimBatchSize))
          .persist()
        try {
          // micro-batches are bounded (maxFilesPerTrigger=1), so the global
          // window over one batch is driver-friendly; chunk count is small
          val nChunks = ordered.agg(coalesce(max(col("__chunk")), lit(-1L)))
            .first().getLong(0) + 1
          (0L until nChunks).foreach { c =>
            process(ordered.filter(col("__chunk") === c).drop("__chunk"), batchId)
          }
        } finally { ordered.unpersist(); () }
      }
      .start()
  }

  /** Event-time windowed throughput stats over a stream of queue
    * completions — watermarked tumbling windows (the idiomatic Spark
    * replacement for the reference's polled stats endpoint).
    *
    * Works on batch frames too: batch execution eliminates the watermark
    * node (Catalyst's EliminateEventTimeWatermark), leaving exactly the
    * windowed aggregation — which is how q149 puts this operator's
    * window/grouping/sum semantics under the DuckDB oracle. The
    * streaming-only part of the contract (rows later than `watermark`
    * behind the max seen event time are dropped; in-bound late rows
    * amend their window) is pinned by QueueStreamSuite's MemoryStream
    * tests, including stream-vs-batch parity on in-bound data. */
  def windowedStats(completions: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    completions
      .withWatermark("end_time", watermark)
      .groupBy(window(col("end_time"), window_), col("status"))
      .agg(count(lit(1)).as("n_jobs"), sum(col("chunk_count")).as("n_chunks"))
}
