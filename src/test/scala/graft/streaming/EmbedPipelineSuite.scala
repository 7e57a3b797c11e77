package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.QueueJob
import graft.sources.{EmbeddingStore, IvfIndex}

class EmbedPipelineSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed requests land in the store with derived columns (claim -> embed -> upsert)") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    val store = new EmbeddingStore(spark, s"$dir/store", numBuckets = 4)
    // seed the store (upsert merges against existing state)
    store.bulkLoad(Seq((999L, 0, Seq(1f, 1f, 1f)))
      .toDF("post_id", "sequence_no", "vector")
      .withColumn("vector_type", lit("seed")))

    val jobs = (1L to 10L).map(i => QueueJob(i, i, 1, "pending",
      Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None))
    jobs.toDF().coalesce(1).write.parquet(s"$dir/requests")

    // deterministic fake embedder: vector derived from the post id
    val query = EmbedPipeline.start(spark, s"$dir/requests", s"$dir/checkpoint", store) {
      chunk =>
        chunk.select(
          col("post_id"),
          lit(0).as("sequence_no"),
          array(col("post_id").cast("float"), lit(2f), lit(-1f)).as("vector"),
          lit("fake-model").as("vector_type"))
    }
    try query.processAllAvailable()
    finally query.stop()

    assert(store.count() == 11, "10 streamed posts + 1 seed")
    val r = store.get(7L, 0).head()
    assert(r.getSeq[Float](r.fieldIndex("vector")) == Seq(7f, 2f, -1f))
    assert(math.abs(r.getAs[Double]("magnitude") - math.sqrt(49 + 4 + 1)) < 1e-6,
      "derived columns computed at ingest")
    val ids = store.read().select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 11, "ids unique across streamed upserts")
  }

  test("stream-ingested corpus searches identically to a batch-built index; replay is a no-op") {
    val dir = Files.createTempDirectory("graft_pipeline_idx").toString
    val store = new EmbeddingStore(spark, s"$dir/store", numBuckets = 4)
    store.bulkLoad(Seq((999L, 0, Seq(1f, 1f, 1f)))
      .toDF("post_id", "sequence_no", "vector")
      .withColumn("vector_type", lit("seed")))
    val cents = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f),
      Array(0f, 0f, 1f), Array(-1f, -1f, -1f))
    val index = new IvfIndex(spark, s"$dir/ivf")
    index.build(store.read().select(col("id"), col("vector")), "id", "vector", cents)

    val jobs = (1L to 10L).map(i => QueueJob(i, i, 1, "pending",
      Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None))
    jobs.toDF().coalesce(1).write.parquet(s"$dir/requests")
    def embedder(chunk: org.apache.spark.sql.DataFrame) = chunk.select(
      col("post_id"),
      lit(0).as("sequence_no"),
      array(col("post_id").cast("float"), lit(2f),
        (col("post_id") % 3).cast("float") - lit(1f)).as("vector"),
      lit("fake-model").as("vector_type"))

    val q1 = EmbedPipeline.startWithIndex(spark, s"$dir/requests",
      s"$dir/checkpoint", store, index)(embedder)
    try q1.processAllAvailable()
    finally q1.stop()

    // the streamed index must equal one built fresh over the final store
    val batch = new IvfIndex(spark, s"$dir/batch")
    batch.build(store.read().select(col("id"), col("vector")), "id", "vector", cents)
    val query = Array(0.5f, 0.5f, 0.5f)
    def results(ix: IvfIndex) = ix.search(query, 11, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamed = results(index)
    assert(streamed == results(batch),
      "stream-maintained index diverged from a fresh batch build")
    assert(streamed.size == 11, "seed + 10 streamed rows all probe-reachable")

    // at-least-once replay: a fresh checkpoint re-delivers every request;
    // the delete-then-append composition must leave the index unchanged
    val q2 = EmbedPipeline.startWithIndex(spark, s"$dir/requests",
      s"$dir/checkpoint2", store, index)(embedder)
    try q2.processAllAvailable()
    finally q2.stop()
    assert(results(index) == streamed, "replay must be idempotent on the index")
    assert(store.count() == 11, "replay must be idempotent on the store")
  }

  test("self-maintaining embed pipeline: in-loop compaction, search unchanged") {
    val dir = Files.createTempDirectory("graft_pipeline_maint").toString
    val store = new EmbeddingStore(spark, s"$dir/store", numBuckets = 4)
    store.bulkLoad(Seq((999L, 0, Seq(1f, 1f, 1f)))
      .toDF("post_id", "sequence_no", "vector")
      .withColumn("vector_type", lit("seed")))
    val cents = Seq(Array(1f, 0f, 0f), Array(0f, 1f, 0f),
      Array(0f, 0f, 1f), Array(-1f, -1f, -1f))
    val index = new IvfIndex(spark, s"$dir/ivf")
    index.build(store.read().select(col("id"), col("vector")), "id", "vector", cents)
    val jobs = (1L to 10L).map(i => QueueJob(i, i, 1, "pending",
      Timestamp.valueOf("2026-01-10 12:00:00"), None, None, 0, None))
    jobs.toDF().coalesce(1).write.parquet(s"$dir/requests")
    def embedder(chunk: org.apache.spark.sql.DataFrame) = chunk.select(
      col("post_id"),
      lit(0).as("sequence_no"),
      array(col("post_id").cast("float"), lit(2f),
        (col("post_id") % 3).cast("float") - lit(1f)).as("vector"),
      lit("fake-model").as("vector_type"))
    val q = EmbedPipeline.startWithIndexMaintained(spark, s"$dir/requests",
      s"$dir/checkpoint", store, index, every = 1, maxFilesPerList = 1)(embedder)
    try q.processAllAvailable()
    finally q.stop()
    val batch = new IvfIndex(spark, s"$dir/batch")
    batch.build(store.read().select(col("id"), col("vector")), "id", "vector", cents)
    val query = Array(0.5f, 0.5f, 0.5f)
    def results(ix: IvfIndex) = ix.search(query, 11, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(results(index) === results(batch),
      "in-loop maintenance must not change what the index serves")
    assert(index.fileStats().collect().forall(_.getInt(1) <= 1),
      "the loop must have compacted its own list accretion")
    intercept[IllegalArgumentException](EmbedPipeline.startWithIndexMaintained(
      spark, s"$dir/requests", s"$dir/ck2", store, index, every = 0)(embedder))
  }
}
