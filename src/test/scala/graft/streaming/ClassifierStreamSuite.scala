package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Curation

/** Pins the streaming quality gate's exact parity with the batch X151
  * classifier: same frozen model, same rows => bit-identical probs,
  * through a real MemoryStream micro-batch run. */
class ClassifierStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = (1L to 40L).map { id =>
    val pos = id % 4 == 0
    val marker = if (pos) "curated encyclopedia" else "spam click"
    (id, s"$marker filler text $id", pos)
  }

  test("streamed scores are bit-identical to the batch classifier") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = corpus.toDF("doc_id", "text", "y")
    val model = ClassifierStream.trainModel(batchDf, col("text"),
      col("y"), dims = 16, iters = 4, lr = 1.0)
    val batch = Curation.qualityClassifier(batchDf, "doc_id", col("text"),
      col("y"), dims = 16, iters = 4, lr = 1.0)
    val want = batch.collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    graft.util.Pins.release(batch)
    val input = MemoryStream[(Long, String)]
    val query = ClassifierStream.score(
        input.toDS().toDF("doc_id", "text"), "doc_id", col("text"), model)
      .writeStream.format("memory").queryName("graft_clf_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus.map(t => (t._1, t._2)): _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_clf_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      assert(streamed === want, "stream/batch probability divergence")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_clf_stream")
    }
  }

  test("gate passes rows through unprojected and thresholds on the rounded prob") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = corpus.toDF("doc_id", "text", "y")
    val model = ClassifierStream.trainModel(batchDf, col("text"),
      col("y"), dims = 16, iters = 4, lr = 1.0)
    val probs = ClassifierStream.score(batchDf, "doc_id", col("text"), model)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val thr = 0.5
    val wantIds = probs.filter(_._2 >= thr).keySet
    assert(wantIds.nonEmpty && wantIds.size < corpus.size,
      s"fixture must split at $thr: $probs")
    val input = MemoryStream[(Long, String)]
    val query = ClassifierStream.gate(
        input.toDS().toDF("doc_id", "text"), col("text"), model, thr)
      .writeStream.format("memory").queryName("graft_clf_gate")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus.map(t => (t._1, t._2)): _*)
      query.processAllAvailable()
      val out = spark.table("graft_clf_gate")
      assert(out.columns.toSeq === Seq("doc_id", "text"),
        "gate must not change the row schema")
      assert(out.select("doc_id").as[Long].collect().toSet === wantIds)
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_clf_gate")
    }
    intercept[IllegalArgumentException](
      ClassifierStream.gate(batchDf, col("text"), model, 1.5))
    intercept[IllegalArgumentException](ClassifierStream.Model(Nil, 0.0))
  }
}
