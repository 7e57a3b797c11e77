package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.QueueConfig
import graft.sources.EmbeddingStore

/** End-to-end streaming embedding ingest — the Spark shape of the
  * reference's poll-claim-embed-upsert worker loop
  * (`src/VectorTableQueue.php:184-226` + `src/VectorTable.php:346-392`):
  *
  *   embed-request files stream in -> claim-sized chunks (QueueStream) ->
  *   caller's `embed` turns post ids into raw vectors (in the reference
  *   this is the external embedding-model call) -> store.upsert computes
  *   the derived columns and merges into the bucketed Parquet store.
  *
  * Delivery: the checkpoint gives at-least-once across restarts; because
  * upsert is a keyed merge on (post_id, sequence_no), replaying a chunk is
  * idempotent — effectively exactly-once on keys, which is strictly
  * stronger than the reference's non-atomic two-statement claim.
  */
object EmbedPipeline {

  /** @param embed maps a claimed chunk (QueueJob rows: job_id, post_id,
    *              chunk_count, ...) to raw embedding rows
    *              (post_id, sequence_no, vector, vector_type). */
  def start(
      spark: SparkSession,
      requestDir: String,
      checkpointDir: String,
      store: EmbeddingStore,
      cfg: QueueConfig = QueueConfig())(
      embed: DataFrame => DataFrame): StreamingQuery =
    QueueStream.start(spark, requestDir, checkpointDir, cfg) { (chunk, _) =>
      // pin the embedder's output: upsert runs several actions (id lookup,
      // staging write) and an unpersisted plan would re-invoke the
      // embedding model per action — and could even stage different
      // vectors than it counted if the model is nondeterministic
      val raw = embed(chunk).persist()
      try { if (!raw.isEmpty) store.upsert(raw) }
      finally { raw.unpersist(); () }
    }
}
