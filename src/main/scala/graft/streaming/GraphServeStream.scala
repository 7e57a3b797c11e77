package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GraphIndex

/** Streaming counterpart of [[graft.sources.GraphIndex.searchTopK]]
  * (X304 at the stream — the serving loop an online ANN endpoint runs):
  * arriving QUERY vectors answer from the persisted proximity graph,
  * per micro-batch, with exactly the batch serve's semantics — the
  * per-hop partition-pruned beam walk and the lazy-tombstone result
  * rule, code-shared through [[GraphIndex.searchTopK]], so parity is by
  * construction and the suite pins it against MemoryStream batches.
  *
  * Shape: a query batch is REQUEST-sized (a serving stream carries
  * queries, not corpus), so the batch collects driver-side and each
  * query runs its own beam walk — queries are independent walks over
  * shared storage, and the graph's navigability does the pruning (a
  * hop touches ≤ frontier-buckets directories, never the edge mass).
  * Tombstones are re-read per walk inside [[GraphIndex.searchTopK]]'s
  * live reads, so an unsubscribed node stops returning on the NEXT
  * batch with no stream restart — the [[PercolateStream]] liveness
  * contract on the graph side.
  *
  * Replay guard: on restart the last uncommitted micro-batch replays;
  * already-answered query ids (present in `outDir`) are skipped so the
  * output stays append-only exactly-once per query id. */
object GraphServeStream {

  /** Answer each micro-batch of `(query_id, qv)` rows from the
    * persisted graph at `graphPath`, appending
    * `(query_id, vec_id, cosine, rank)` rows to `outDir`. */
  def answerBatch(batch: DataFrame, gi: GraphIndex, embs: DataFrame,
      idCol: String, vecCol: String, k: Int, beamWidth: Int,
      maxHops: Int = 64, entryId: Option[Long] = None): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val queries = batch.select(col("query_id").cast("long"), col("qv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
      .sortBy(_._1)
    val answered = queries.map { case (qid, qv) =>
      gi.searchTopK(embs, idCol, vecCol, qv, k, beamWidth, maxHops, entryId)
        .withColumn("query_id", lit(qid))
        .withColumn("rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("cosine").desc, col(idCol).asc)))
        .select(col("query_id"), col(idCol), col("cosine"), col("rank"))
    }
    answered.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataset[(Long, Long, Double, Int)]
        .toDF("query_id", idCol, "cosine", "rank"))
  }

  def start(
      spark: SparkSession,
      queriesDir: String,
      checkpointDir: String,
      outDir: String,
      graphPath: String,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      beamWidth: Int,
      maxHops: Int = 64,
      entryId: Option[Long] = None,
      buckets: Int = 16,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val gi = new GraphIndex(spark, graphPath, buckets)
    spark.readStream
      .schema(schema.getOrElse(spark.read.parquet(queriesDir).schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(queriesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh = freshQueries(spark, outDir, batch)
        if (!fresh.isEmpty)
          answerBatch(fresh, gi, embs, idCol, vecCol, k, beamWidth,
            maxHops, entryId)
            .write.mode("append").parquet(outDir)
      }
      .start()
  }

  private def freshQueries(spark: SparkSession, outDir: String,
      batch: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deduped = batch.dropDuplicates("query_id")
    if (!fs.exists(new org.apache.hadoop.fs.Path(outDir))) deduped
    else {
      val ids = batch.select(col("query_id")).distinct()
      val done = spark.read.parquet(outDir).select(col("query_id"))
        .join(broadcast(ids), Seq("query_id"), "left_semi")
      deduped.join(broadcast(done), Seq("query_id"), "left_anti")
    }
  }
}
