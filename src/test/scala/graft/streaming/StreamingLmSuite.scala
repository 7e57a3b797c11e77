package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Pins the streaming scorer's exact parity with the batch X64 operator:
  * same model, same rows => bit-identical scores, through a real
  * MemoryStream micro-batch run. */
class StreamingLmSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // edge cases on purpose: doc 4 has an unseen head, doc 5 is 1-token
  // (omitted), doc 6 has runs of whitespace and boundary spaces, doc 7's
  // tab-newline mix exercises the whitespace class
  private val rows = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the rug",
    3L -> "the cat ran",
    4L -> "zork blee zork",
    5L -> "solo",
    6L -> "  the   cat  sat  ",
    7L -> "the\tcat\nsat")
  private val ref = Seq(
    101L -> "the cat sat on the mat",
    102L -> "the dog ran to the cat").toDF("doc_id", "text")

  test("streamed scores are bit-identical to batch lmScore") {
    implicit val sqlCtx = spark.sqlContext
    val model = LmStream.buildModel(ref, "doc_id", col("text"))
    val input = MemoryStream[(Long, String)]
    val query = LmStream.score(input.toDS(), model)
      .writeStream.format("memory").queryName("graft_lm_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("graft_lm_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      val batch = TextAnalysis.lmScore(
          rows.toDF("doc_id", "text"), ref, "doc_id", col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSet
      assert(batch.map(_._1) === Set(1L, 2L, 3L, 4L, 6L, 7L), "doc 5 omitted")
      assert(streamed === batch, "stream/batch divergence")
      // whitespace runs and boundary spaces must not change tokenization
      val byId = streamed.map(t => t._1 -> t).toMap
      assert(byId(6L)._2 == 2L && byId(6L)._3 == byId(7L)._3,
        "docs 6 and 7 tokenize to the same bigrams as 'the cat sat'")
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_lm_stream")
    }
  }

  test("model build matches the batch count tables") {
    val m = LmStream.buildModel(ref, "doc_id", col("text"))
    // ref bigrams: (the,cat)x2 (cat,sat) (sat,on) (on,the) (the,mat)
    //              (the,dog) (dog,ran) (ran,to) (to,the)
    assert(m.c2(("the", "cat")) == 2L && m.c2(("to", "the")) == 1L)
    assert(m.c1("the") == 4L)
    assert(m.v == 8L, s"distinct continuations: cat sat on the mat dog ran to = 8, got ${m.v}")
  }

  test("minCount floors the bigram table only; heads and V stay exact; pruned = unseen") {
    val m1 = LmStream.buildModel(ref, "doc_id", col("text"))
    val m2 = LmStream.buildModel(ref, "doc_id", col("text"), minCount = 2)
    assert(m2.c2.keySet === Set(("the", "cat")),
      "only the count-2 bigram survives the floor")
    assert(m2.c1 === m1.c1 && m2.v === m1.v,
      "heads and V are denominators — exact, aggregated before the floor")
    // a surviving bigram scores identically...
    assert(LmStream.scoreDoc("the cat", m2) === LmStream.scoreDoc("the cat", m1))
    // ...a pruned one scores exactly as unseen: alpha / (c1(w1) + alpha*V)
    def r6(x: Double) = BigDecimal.valueOf(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp = r6(-math.log(0.5 / (1.0 + 0.5 * 8.0))) // c1(cat)=1, V=8
    assert(LmStream.scoreDoc("cat sat", m2) ===
      Some((1L, r6(lp / 1), r6(math.exp(r6(lp / 1))))))
    intercept[IllegalArgumentException](
      LmStream.buildModel(ref, "doc_id", col("text"), minCount = 0))
  }

  test("join-served scoring ≡ batch lmScore; frozen NgramLm bi table ≡ recount") {
    val docs = rows.toDF("doc_id", "text")
    val batch = TextAnalysis.lmScore(docs, ref, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_join").toString
    new graft.sources.NgramLm(spark, s"$dir/lm").build(ref, "doc_id", col("text"))
    val bg = LmStream.freezeCounts(spark, s"$dir/lm")
    val joined = LmStream.scoreJoined(docs, "doc_id", col("text"), bg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(joined === batch,
      "the persisted bi table must reproduce the recount path bit-for-bit")
    val plan = LmStream.scoreJoined(docs, "doc_id", col("text"), bg)
      .queryExecution.sparkPlan.toString
    assert("(?i)join".r.findAllIn(plan).size >= 2,
      s"the model must arrive via joins, not a driver map:\n$plan")
  }
}
