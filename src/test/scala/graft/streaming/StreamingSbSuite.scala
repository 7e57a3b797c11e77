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

  test("join-served stream: file-stream scores ≡ batch stupidBackoff, replay-guarded, no driver table") {
    val dir = Files.createTempDirectory("graft_sb_join").toString
    new NgramLm(spark, s"$dir/lm").build(ref, "doc_id", col("text"))
    // two files => two micro-batches; the second re-sends doc 2 (a
    // crawler re-fetch) which the replay guard must drop
    val docsDir = s"$dir/docs"
    rows.take(3).toDF("doc_id", "text").write.parquet(docsDir)
    val query = SbStream.startJoined(spark, docsDir, s"$dir/ckpt",
      s"$dir/out", s"$dir/lm")
    try {
      query.processAllAvailable()
      rows.drop(3).toDF("doc_id", "text")
        .union(Seq(rows(1)).toDF("doc_id", "text"))
        .write.mode("append").parquet(docsDir)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_trigrams")),
        r.getDouble(r.fieldIndex("xent")), r.getDouble(r.fieldIndex("ppl"))))
      .toSeq
    val batch = TextAnalysis.stupidBackoff(
        rows.toDF("doc_id", "text"), ref, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(streamed.size === streamed.map(_._1).distinct.size,
      "replayed doc 2 must not score twice")
    assert(streamed.toSet === batch.toSet,
      "join-served stream must be bit-identical to the batch operator")
    // the audit the scale claim rests on: the model arrives through
    // joins against the persisted tables, never a driver-side map
    val tables = SbStream.freezeTables(spark, s"$dir/lm")
    val plan = SbStream.scoreJoined(rows.toDF("doc_id", "text"), "doc_id",
      col("text"), tables).queryExecution.sparkPlan.toString
    assert("(?i)join".r.findAllIn(plan).size >= 5,
      s"expected the five count-table joins in the plan:\n$plan")
  }

  test("minCount floor: survivors score identically, pruned n-grams take the backoff branch, N/V exact") {
    val ref2 = Seq(
      101L -> "the cat sat on the mat",
      102L -> "the cat sat here now").toDF("doc_id", "text")
    val m1 = SbStream.buildModel(ref2, "doc_id", col("text"))
    val m2 = SbStream.buildModel(ref2, "doc_id", col("text"), minCount = 2)
    assert(m2.n === m1.n && m2.v === m1.v,
      "N and V must stay the exact corpus totals under the floor")
    assert(m2.c3.keySet === Set(("the", "cat", "sat")) &&
      m2.c2.keySet === Set(("the", "cat"), ("cat", "sat")),
      "only count-2 n-grams survive a minCount=2 floor")
    // every n-gram of this doc survives => bit-identical to unfloored
    assert(SbStream.scoreDoc("the cat sat", m2) ===
      SbStream.scoreDoc("the cat sat", m1))
    // 'cat sat on': trigram pruned, bigram (sat,on) pruned, unigram
    // 'on' pruned => the full OOV branch with EXACT N=11, V=7
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp = r6(-math.log(0.4 * 0.4 * ((0.0 + 1.0) / (11.0 + 7.0))))
    assert(SbStream.scoreDoc("cat sat on", m2) ===
      Some((1L, r6(lp / 1), r6(math.exp(r6(lp / 1))))))
    intercept[IllegalArgumentException](
      SbStream.buildModel(ref2, "doc_id", col("text"), minCount = 0))
    // artifact load applies the same floor
    val dir = Files.createTempDirectory("graft_sb_floor").toString
    new NgramLm(spark, s"$dir/lm").build(ref2, "doc_id", col("text"))
    val loaded = SbStream.loadModel(spark, s"$dir/lm", minCount = 2)
    assert(loaded === m2)
  }
}
