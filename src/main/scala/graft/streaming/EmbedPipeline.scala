package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.QueueConfig
import graft.sources.{EmbeddingStore, IvfIndex}

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

  /** [[start]] plus STEADY-STATE INDEX MAINTENANCE: each micro-batch,
    * after the store upsert, the batch's rows (with their store-assigned
    * ids) are folded into a persisted [[IvfIndex]] as a KEYED index
    * upsert — `delete(batch ids)` then `append(batch rows)` against the
    * frozen stored centroids. The delete leg makes the composition
    * idempotent on keys end-to-end: an at-least-once replay (or an
    * upsert that REPLACES an existing vector) first removes the id's
    * stale entry, so the index never holds two vectors for one id — the
    * same effectively-exactly-once contract the store's keyed merge
    * gives, extended to the index. Both legs are batch-proportional
    * (X124 append; X129 bucket-pruned sidecar discovery), so the
    * continuously-ingesting steady state every component exists for —
    * ingest → upsert → searchable index — is one checkpointed stream.
    *
    * The index must be [[IvfIndex.build built]] (centroids + sidecar)
    * before the stream starts; re-training centroids remains an offline
    * rebuild, as for any IVF. */
  def startWithIndex(
      spark: SparkSession,
      requestDir: String,
      checkpointDir: String,
      store: EmbeddingStore,
      index: IvfIndex,
      cfg: QueueConfig = QueueConfig())(
      embed: DataFrame => DataFrame): StreamingQuery =
    QueueStream.start(spark, requestDir, checkpointDir, cfg) { (chunk, _) =>
      upsertAndIndex(store, index, embed(chunk))
    }

  /** One micro-batch's store-then-index fold (shared by
    * [[startWithIndex]] and [[startWithIndexMaintained]]). */
  private def upsertAndIndex(store: EmbeddingStore, index: IvfIndex,
      batch: DataFrame): Unit = {
    val raw = batch.persist()
    try {
      if (!raw.isEmpty) {
        store.upsert(raw)
        // read back this batch's rows to pick up the store-assigned ids
        // (stable across replays — upsert reuses the existing id on merge)
        val keys = raw.select(col("post_id"), col("sequence_no")).distinct()
        val batchRows = store.read()
          .join(keys, Seq("post_id", "sequence_no"), "left_semi")
          .select(col("id"), col("vector")).persist()
        try {
          index.delete(batchRows.select(col("id")))
          index.append(batchRows, "id", "vector")
        } finally { batchRows.unpersist(); () }
      }
    } finally { raw.unpersist(); () }
  }

  /** [[startWithIndex]] with the maintenance policy
    * ([[IvfIndex.maintain]], X186) folded into the ingest loop — the
    * [[IndexIngest.startMaintained]] twin on the dense side: every
    * `every`-th micro-batch, after its fold, the index compacts exactly
    * the `ivf_list=N` directories (and accreted sidecar buckets) past
    * `maxFilesPerList` part-files, so the keyed delete+append churn a
    * long-running embed pipeline generates tends its own file
    * accretion. Maintenance runs between folds on the micro-batch
    * thread (single-writer by the stream's serializability); a crash
    * mid-compaction recovers at the next fold's entry points. An
    * untriggered check reads only file listings. */
  def startWithIndexMaintained(
      spark: SparkSession,
      requestDir: String,
      checkpointDir: String,
      store: EmbeddingStore,
      index: IvfIndex,
      every: Int = 16,
      maxFilesPerList: Int = 8,
      cfg: QueueConfig = QueueConfig())(
      embed: DataFrame => DataFrame): StreamingQuery = {
    require(every >= 1, s"every must be >= 1, got $every")
    QueueStream.start(spark, requestDir, checkpointDir, cfg) { (chunk, batchId) =>
      upsertAndIndex(store, index, embed(chunk))
      if ((batchId + 1) % every == 0) {
        index.maintain(maxFilesPerList)
        ()
      }
    }
  }
}
