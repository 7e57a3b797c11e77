package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis
import graft.sources.InvertedIndex

/** The streaming index fold must leave an index indistinguishable from a
  * batch build over the same corpus, and at-least-once replay must be a
  * no-op on doc ids. */
class IndexIngestSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val seed = Seq(
    (1L, "merge sort beats bubble sort"),
    (2L, "sort merge join strategy")).toDF("doc_id", "text")
  private val wave1 = Seq(
    (3L, "another sort merge document"),
    (4L, "no match here")).toDF("doc_id", "text")
  private val wave2 = Seq(
    (5L, "sort merge once more"),
    (6L, "plain filler text")).toDF("doc_id", "text")

  private def bm(idx: InvertedIndex) =
    idx.bm25(Seq("sort", "merge"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("stream-ingested corpus answers identically to a batch build; replay is a no-op") {
    val dir = Files.createTempDirectory("graft_idx_ingest").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 8)
    idx.build(seed, "doc_id", col("text"))
    wave1.coalesce(1).write.parquet(s"$dir/docs")
    wave2.coalesce(1).write.mode("append").parquet(s"$dir/docs")

    val q = IndexIngest.start(spark, s"$dir/docs", s"$dir/ckpt", idx)
    try q.processAllAvailable()
    finally q.stop()

    val full = new InvertedIndex(spark, s"$dir/full", buckets = 8)
    full.build(seed.union(wave1).union(wave2), "doc_id", col("text"))
    assert(bm(idx) === bm(full),
      "streamed appends must equal one batch build — stats included")

    // at-least-once replay: fold an already-consumed batch again
    IndexIngest.foldBatch(idx, wave1, "doc_id", col("text"))
    assert(bm(idx) === bm(full), "replayed batch must not double postings")
    assert(idx.appendedIds.count() === 6)
  }

  test("within-batch duplicate ids collapse to one row; guard sees tombstoned docs") {
    val dir = Files.createTempDirectory("graft_idx_ingest2").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 4)
    idx.build(seed, "doc_id", col("text"))

    val dupBatch = Seq((7L, "sort merge alpha"), (7L, "sort merge alpha"))
      .toDF("doc_id", "text")
    IndexIngest.foldBatch(idx, dupBatch, "doc_id", col("text"))
    assert(idx.termPostings(Seq("alpha")).count() === 1,
      "a doc crawled twice in one batch lands once")

    // tombstone doc 7, then replay it: the guard must still drop it —
    // re-appending would resurrect a deleted doc
    idx.delete(Seq(7L).toDF("doc_id"))
    IndexIngest.foldBatch(idx, dupBatch, "doc_id", col("text"))
    assert(TextAnalysis.phraseMatch(idx.termPostings(Seq("sort", "merge")),
        Seq("sort", "merge"))
      .filter(col("doc_id") === 7L).count() === 0,
      "tombstoned doc stays deleted across a replay")
    // after vacuum the id is physically gone — re-ingest is legitimate
    idx.vacuum()
    IndexIngest.foldBatch(idx, dupBatch, "doc_id", col("text"))
    assert(idx.termPostings(Seq("alpha")).count() === 1,
      "post-vacuum re-ingest of the id is a fresh append")
  }

  test("self-maintaining ingest: the loop compacts its own accretion, answers unchanged") {
    val dir = Files.createTempDirectory("graft_idx_maint").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 4)
    idx.build(seed, "doc_id", col("text"))
    // one file per wave => one micro-batch per wave; maintenance fires
    // after every batch with a 1-file threshold, so the accretion each
    // append causes is compacted away inside the loop itself
    wave1.coalesce(1).write.parquet(s"$dir/docs")
    wave2.coalesce(1).write.mode("append").parquet(s"$dir/docs")
    val q = IndexIngest.startMaintained(spark, s"$dir/docs", s"$dir/ckpt",
      idx, every = 1, maxFilesPerBucket = 1)
    try q.processAllAvailable()
    finally q.stop()
    val full = new InvertedIndex(spark, s"$dir/full", buckets = 4)
    full.build(seed.union(wave1).union(wave2), "doc_id", col("text"))
    assert(bm(idx) === bm(full),
      "in-loop maintenance must not change what the index serves")
    assert(idx.fileStats().collect().forall(_.getInt(1) <= 1),
      "the loop must have compacted its own file accretion")
    // replay after a compaction is still a no-op on ids
    IndexIngest.foldBatch(idx, wave2, "doc_id", col("text"))
    assert(bm(idx) === bm(full))
    intercept[IllegalArgumentException](IndexIngest.startMaintained(
      spark, s"$dir/docs", s"$dir/ckpt2", idx, every = 0))
  }
}
