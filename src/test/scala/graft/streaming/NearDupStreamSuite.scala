package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NearDupStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // simhashes crafted per-bucket: top 16 bits pick the bucket
  private val baseA = 0x1234L << 48 | 0xABCDEFL
  private val baseB = 0x9999L << 48 | 0xABCDEFL // same low bits, other bucket

  private def run(batches: Seq[Seq[DocArrival]]): Map[Long, (Option[Long], Option[Int])] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DocArrival]
    val out = NearDupStream.detect(
      input.toDS().withWatermark("at", "10 minutes").as[DocArrival],
      maxHamming = 3, retentionMs = 30 * 60000L)
    val name = s"graft_neardup_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name).as[NearDupVerdict].collect()
        .map(v => v.doc_id -> ((v.dup_of, v.hamming))).toMap
    } finally {
      query.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }

  test("in-threshold arrival flags against the canonical; far/other-bucket docs are novel") {
    val got = run(Seq(
      Seq(DocArrival(1L, baseA, ts("2026-01-10 12:00:00"))),
      Seq(
        DocArrival(2L, baseA ^ 1L, ts("2026-01-10 12:01:00")), // hamming 1
        DocArrival(3L, baseA ^ 0x3FL, ts("2026-01-10 12:02:00")), // hamming 6 > 3
        DocArrival(4L, baseB, ts("2026-01-10 12:03:00"))))) // other bucket
    assert(got(1L) === ((None, None)))
    assert(got(2L) === ((Some(1L), Some(1))), s"near doc flags against canonical: $got")
    assert(got(3L) === ((None, None)), "beyond threshold is novel")
    assert(got(4L) === ((None, None)), "other bucket never compared")
  }

  test("dup chains collapse onto the first canonical (dups are not added to state)") {
    val got = run(Seq(
      Seq(DocArrival(1L, baseA, ts("2026-01-10 12:00:00"))),
      Seq(DocArrival(2L, baseA ^ 1L, ts("2026-01-10 12:01:00"))),
      // near doc 2 AND doc 1; doc 2 is not in state, so verdict is vs doc 1
      Seq(DocArrival(5L, baseA ^ 2L, ts("2026-01-10 12:02:00")))))
    assert(got(5L) === ((Some(1L), Some(1))), s"chain collapses to canonical: $got")
  }

  test("idle bucket evicts after retention; a later near-dup is novel again") {
    val got = run(Seq(
      Seq(DocArrival(1L, baseA, ts("2026-01-10 12:00:00"))),
      // push the watermark far past 12:00 + 30min retention
      Seq(DocArrival(9L, baseB, ts("2026-01-10 14:00:00"))),
      Seq(DocArrival(6L, baseA ^ 1L, ts("2026-01-10 14:01:00")))))
    assert(got(6L) === ((None, None)),
      s"bucket state evicted after retention -> re-arrival is novel: $got")
  }

  test("per-entry retention: an old canonical expires even in a never-idle bucket") {
    val far = 0xFF00L // 8 flipped bits: keep-alive docs never match anything
    val got = run(Seq(
      Seq(DocArrival(1L, baseA, ts("2026-01-10 12:00:00"))),
      // keep the bucket busy past 12:00 + 30min retention (novel docs only)
      Seq(DocArrival(2L, baseA ^ far, ts("2026-01-10 12:40:00"))),
      Seq(DocArrival(3L, baseA ^ (far << 8), ts("2026-01-10 13:20:00"))),
      Seq(DocArrival(4L, baseA ^ (far << 16), ts("2026-01-10 14:00:00"))),
      // near doc 1, but doc 1's entry is past the horizon -> novel
      Seq(DocArrival(6L, baseA ^ 1L, ts("2026-01-10 14:01:00")))))
    assert(got(6L) === ((None, None)),
      s"canonical past retention must not match even if its bucket never idles: $got")
  }

  test("state survives a checkpoint restart: a post-restart near-dup still flags") {
    import java.nio.file.Files
    import scala.collection.mutable
    val dir = Files.createTempDirectory("graft_neardup_ckpt").toString
    val schema = org.apache.spark.sql.Encoders.product[DocArrival].schema
    val verdicts = mutable.Map.empty[Long, Option[Long]]

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/docs")
        .withWatermark("at", "10 minutes").as[DocArrival]
      val q = NearDupStream.detect(stream, maxHamming = 3, retentionMs = 60 * 60000L)
        .writeStream.outputMode(OutputMode.Update())
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[NearDupVerdict], _: Long) =>
          batch.collect().foreach(v => verdicts.synchronized { verdicts(v.doc_id) = v.dup_of })
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    Seq(DocArrival(1L, baseA, ts("2026-01-10 12:00:00"))).toDS()
      .write.mode("append").parquet(s"$dir/docs")
    runOnce()
    // restart from the same checkpoint: the canonical must come back from
    // the state store, not from reprocessing batch 1
    Seq(DocArrival(2L, baseA ^ 1L, ts("2026-01-10 12:05:00"))).toDS()
      .write.mode("append").parquet(s"$dir/docs")
    runOnce()

    val got = verdicts.synchronized(verdicts.toMap)
    assert(got(1L) === None)
    assert(got(2L) === Some(1L),
      s"doc 1's canonical entry must survive the restart via the state store: $got")
  }

  test("same-batch determinism: min (hamming, id) canonical wins") {
    val got = run(Seq(
      // two canonicals land first (12:00), both at hamming 1 from doc 30
      Seq(
        DocArrival(10L, baseA ^ 4L, ts("2026-01-10 12:00:00")),
        DocArrival(20L, baseA ^ 8L, ts("2026-01-10 12:00:00")),
        DocArrival(30L, baseA ^ 4L ^ 8L, ts("2026-01-10 12:01:00")))))
    // 10 and 20 differ pairwise by hamming 2 <= 3: processed in (at, id)
    // order, 10 is canonical, 20 flags against 10; 30 (= baseA^4^8) is
    // hamming 1 from BOTH — but 20 never entered state, so the verdict is
    // against canonical 10 (xor difference = bit 8 -> hamming 1)
    assert(got(10L) === ((None, None)))
    assert(got(20L) === ((Some(10L), Some(2))), got.toString)
    assert(got(30L) === ((Some(10L), Some(1))), got.toString)
  }
}
