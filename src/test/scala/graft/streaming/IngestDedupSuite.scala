package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IngestDedupSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup: first arrival wins within the watermark; state evicts after it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = IngestDedup.dedupStream(
      input.toDF().toDF("doc_id", "text", "ts"), col("text"), "ts", "10 minutes")
    val query = out.writeStream.format("memory").queryName("graft_ingest_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct docs (the dup goes in its OWN batch below:
      // within one micro-batch the surviving row among simultaneous
      // duplicates is a shuffle-order pick — asserting on it would flake)
      input.addData(
        (1L, "Hello World", ts("2026-01-10 12:00:00")),
        (3L, "something else", ts("2026-01-10 12:02:00")))
      query.processAllAvailable()
      // batch 2: normalized-equal content inside the horizon -> dropped
      // (case + whitespace differences still collide)
      input.addData((2L, "hello   world", ts("2026-01-10 12:01:00")))
      query.processAllAvailable()
      input.addData((4L, "HELLO WORLD", ts("2026-01-10 12:05:00")))
      query.processAllAvailable()
      // batch 3: advance event time far past the horizon (evicts state),
      // then a re-crawl of the same content -> legitimately re-emitted
      input.addData((5L, "filler", ts("2026-01-10 13:00:00")))
      query.processAllAvailable()
      input.addData((6L, "hello world", ts("2026-01-10 13:01:00")))
      query.processAllAvailable()

      val ids = spark.table("graft_ingest_dedup")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(1L), "first arrival of the dup content kept")
      assert(!ids.contains(2L) && !ids.contains(4L),
        s"in-horizon duplicates (normalized-equal text) dropped: $ids")
      assert(ids.contains(3L) && ids.contains(5L), s"distinct docs pass: $ids")
      assert(ids.contains(6L),
        s"after watermark eviction a re-crawl is a new snapshot: $ids")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_ingest_dedup")
    }
  }

  test("normalized key: crawl-noise re-fetches drop, raw key re-admits them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = IngestDedup.dedupStream(
      input.toDF().toDF("doc_id", "text", "ts"), col("text"), "ts",
      "10 minutes", normalized = true)
    val query = out.writeStream.format("memory").queryName("graft_ingest_norm")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "views: 1024 nice page", ts("2026-01-10 12:00:00")))
      query.processAllAvailable()
      // the re-fetch: counter rotated, punctuation re-serialized — the
      // class the raw fingerprint cannot catch
      input.addData((2L, "views: 2048 nice page!", ts("2026-01-10 12:01:00")))
      query.processAllAvailable()
      // a genuine edit still passes
      input.addData((3L, "views: 1024 nicer page", ts("2026-01-10 12:02:00")))
      query.processAllAvailable()
      val ids = spark.table("graft_ingest_norm")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L),
        s"noise re-fetch dropped, real edit kept: $ids")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_ingest_norm")
    }
  }

  test("dedup state survives a checkpoint restart: a post-restart dup still drops") {
    import java.nio.file.Files
    import scala.collection.mutable
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_ingest_ckpt").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("ts", TimestampType)))
    val emitted = mutable.Set.empty[Long]

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/docs")
      val q = IngestDedup.dedupStream(stream, col("text"), "ts", "10 minutes")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("doc_id").collect()
            .foreach(r => emitted.synchronized { emitted += r.getLong(0) })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Seq((1L, "restart me", ts("2026-01-10 12:00:00"))).toDF("doc_id", "text", "ts")
      .write.mode("append").parquet(s"$dir/docs")
    runOnce()
    Seq((2L, "RESTART   me", ts("2026-01-10 12:03:00"))).toDF("doc_id", "text", "ts")
      .write.mode("append").parquet(s"$dir/docs")
    runOnce()

    val got = emitted.synchronized(emitted.toSet)
    assert(got === Set(1L),
      s"the fingerprint state must survive the restart and drop the dup: $got")
  }
}
