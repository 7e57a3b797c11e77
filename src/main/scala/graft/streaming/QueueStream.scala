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
        // the micro-batch is the claim: priority-order it and cap at the
        // claim batch size, exactly the reference's SELECT half
        val claimed = EmbedQueue
          .nextBatch(batch, cfg)
        process(claimed, batchId)
      }
      .start()
  }

  /** Event-time windowed throughput stats over a stream of queue
    * completions — watermarked tumbling windows (the idiomatic Spark
    * replacement for the reference's polled stats endpoint). */
  def windowedStats(completions: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    completions
      .withWatermark("end_time", watermark)
      .groupBy(window(col("end_time"), window_), col("status"))
      .agg(count(lit(1)).as("n_jobs"), sum(col("chunk_count")).as("n_chunks"))
}
