package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Curation

/** The quality gate is pure per-row Column composition, so the SAME
  * operator runs unchanged on a stream — ingest-time filtering with the
  * batch-identical semantics (no train/serve skew between the backfill
  * job and the live feed). This suite pins that property: batch and
  * streaming answers over the same rows must be identical. */
class StreamingGateSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gopherGate on a stream equals the batch gate row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      1L -> "tiny doc",
      2L -> ("the quick brown fox jumps over a lazy dog and runs to the " +
        "river bank in spring for fun on sunny days with friends"),
      3L -> (1 to 25).map(i => s"tok$i").mkString(" "),
      4L -> Seq.fill(8)("the cats with").mkString(" "))
    val input = MemoryStream[(Long, String)]
    val gated = Curation.gopherGate(
      input.toDF().toDF("doc_id", "text"), "doc_id", col("text"))
    val query = gated.writeStream.format("memory").queryName("graft_stream_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_stream_gate")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          Option(r.getString(3)))).toSet
      val batch = Curation.gopherGate(rows.toDF("doc_id", "text"), "doc_id", col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          Option(r.getString(3)))).toSet
      assert(streamed === batch, "streaming and batch gates diverged")
      assert(streamed.map(t => t._1 -> t._4).toMap ===
        Map(1L -> Some("too_short"), 2L -> None,
          3L -> Some("few_stopwords"), 4L -> Some("repetition")))
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_stream_gate")
    }
  }
}
