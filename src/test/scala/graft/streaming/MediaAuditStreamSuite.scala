package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal

/** Pins the streaming media audit's structural parity with the batch
  * container walks: the same codec objects run in both, so a payload
  * audits identically at ingest and in backfill — checked through a
  * real MemoryStream micro-batch run over all four container families
  * plus junk. */
class MediaAuditStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payloads = {
    val docs = Seq((4L, "mp4 text"), (5L, "more")).toDF("doc_id", "text")
    val mp4 = Multimodal.fromTextAsMp4s(docs, "doc_id", "text")
      .select(col("media_id"), col("payload"))
    val mp3 = Multimodal.fromTextAsMp3s(
        Seq((10L, "cbr")).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("media_id"), col("payload"))
    val ogg = Multimodal.fromTextAsOggs(
        Seq((20L, "o")).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("media_id"), col("payload"))
    val mkv = Multimodal.fromTextAsMkvs(
        Seq((30L, "m")).toDF("doc_id", "text"), "doc_id", "text")
      .select(col("media_id"), col("payload"))
    val junk = Seq((99L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload")
    mp4.unionAll(mp3).unionAll(ogg).unionAll(mkv).unionAll(junk)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
  }

  test("streamed audit ≡ batch audit; every arrival accounted, junk included") {
    implicit val sqlCtx = spark.sqlContext
    val rows = payloads
    val input = MemoryStream[(Long, Array[Byte])]
    val query = MediaAuditStream.audit(
        input.toDS().toDF("media_id", "payload"))
      .writeStream.format("memory").queryName("graft_media_audit")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      def tup(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      val streamed = tup(spark.table("graft_media_audit"))
      val batch = tup(MediaAuditStream.audit(
        rows.toDF("media_id", "payload")))
      assert(streamed === batch, "stream/batch divergence")
      val byId = streamed.map(t => t._1 -> t).toMap
      // mp4 id 4: 2 samples, 80 ms (the q319 fixture numbers)
      assert(byId(4L) === ((4L, "mp4", 2, 80L)))
      assert(byId(10L)._2 == "mp3" && byId(10L)._3 == 30) // 20 + 10 % 30
      assert(byId(20L) === ((20L, "ogg", 3, -1L)), "ogg duration is codec-rate-bound")
      assert(byId(30L)._2 == "mkv" && byId(30L)._3 == 1)
      assert(byId(99L) === ((99L, "unknown", -1, -1L)),
        "junk keeps its row — the quarantine rate must be visible")
      assert(streamed.size === rows.size, "every arrival audited exactly once")
    } finally query.stop()
  }
}
