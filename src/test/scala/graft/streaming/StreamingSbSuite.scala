package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis
import graft.sources.NgramLm

/** Pins the streaming Stupid Backoff scorer's exact parity with the
  * batch X154 operator — and the persisted-artifact load path with the
  * direct count path — through a real MemoryStream micro-batch run. */
class StreamingSbSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    1L -> "the cat sat on the mat today",   // seen trigrams
    2L -> "zork the cat sat here",          // backoff paths
    3L -> "q w e",                          // full OOV floor
    4L -> "two words",                      // omitted (< 3 tokens)
    5L -> "  the   cat  sat  on the mat ",  // whitespace runs
    6L -> "the\tcat\nsat on\tthe mat")      // whitespace class
  private val ref = Seq(
    101L -> "the cat sat on the mat",
    102L -> "the dog ran to the cat").toDF("doc_id", "text")

  test("streamed scores are bit-identical to batch stupidBackoff; artifact load matches") {
    implicit val sqlCtx = spark.sqlContext
    val model = SbStream.buildModel(ref, "doc_id", col("text"))
    val input = MemoryStream[(Long, String)]
    val query = SbStream.score(input.toDS(), model)
      .writeStream.format("memory").queryName("graft_sb_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_sb_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val batch = TextAnalysis.stupidBackoff(
          rows.toDF("doc_id", "text"), ref, "doc_id", col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(batch.map(_._1) === Set(1L, 2L, 3L, 5L, 6L), "doc 4 omitted")
      assert(streamed === batch, "stream/batch divergence")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_sb_stream")
    }
    // a model frozen FROM the persisted artifact scores identically
    val dir = Files.createTempDirectory("graft_sb_lm").toString
    new NgramLm(spark, s"$dir/lm").build(ref, "doc_id", col("text"))
    val loaded = SbStream.loadModel(spark, s"$dir/lm")
    rows.foreach { case (id, text) =>
      assert(SbStream.scoreDoc(text, loaded) === SbStream.scoreDoc(text, model),
        s"doc $id: artifact-loaded model diverged from direct count") }
    intercept[IllegalArgumentException](
      SbStream.buildModel(ref, "doc_id", col("text"), lambda = 1.0))
  }
}
