package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Curation

class BudgetStreamSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, String, Long)]],
      budgets: Map[String, Long]): Seq[AdmittedDoc] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val query = BudgetStream.admit(input.toDS(), budgets)
      .writeStream.format("memory").queryName("graft_budget_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table("graft_budget_stream").collect()
        .map(r => AdmittedDoc(r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
    } finally {
      query.stop()
      spark.sql("DROP VIEW IF EXISTS graft_budget_stream")
    }
  }

  test("prefix-cut semantics: the first over-budget doc closes its source") {
    val out = run(Seq(Seq(
      (1L, "a", 40L), (2L, "a", 50L), (3L, "a", 5L),  // 40, 90, 95 vs 100
      (4L, "a", 20L),                                  // 115 > 100: closed
      (5L, "a", 1L),                                   // would fit, but after
      (6L, "b", 10L)
    )), Map("a" -> 100L, "b" -> 100L))
    assert(out.filter(_.source == "a").map(_.doc_id).sorted == Seq(1L, 2L, 3L),
      s"doc 5 must NOT squeeze past the closed budget: $out")
    assert(out.filter(_.source == "b").map(_.doc_id) == Seq(6L))
    // cum_tokens is the running INCLUSIVE total
    assert(out.find(_.doc_id == 3L).get.cum_tokens == 95L)
  }

  test("state persists across micro-batches; unbudgeted sources drop") {
    val out = run(Seq(
      Seq((1L, "a", 60L), (9L, "zzz", 1L)),
      Seq((2L, "a", 30L), (3L, "a", 30L))   // 90 ok, 120 > 100
    ), Map("a" -> 100L))
    assert(out.map(_.doc_id).sorted == Seq(1L, 2L),
      s"budget must span the batch boundary: $out")
    assert(!out.exists(_.source == "zzz"))
    intercept[IllegalArgumentException](
      BudgetStream.admit(Seq.empty[(Long, String, Long)].toDS(), Map.empty))
    intercept[IllegalArgumentException](
      BudgetStream.admit(Seq.empty[(Long, String, Long)].toDS(), Map("a" -> 0L)))
  }

  test("fed in the batch operator's order, admission is bit-identical to mixtureSample") {
    val rnd = new scala.util.Random(164)
    val docs = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", 5L + rnd.nextInt(20)))
    val budgets = Seq("a" -> 150L, "b" -> 200L)
    val batch = Curation.mixtureSample(docs.toDF("doc_id", "src", "toks"),
      col("src"), "doc_id", col("toks"), budgets, seed = "s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // replay each source's md5-ordered sequence as the arrival order
    def key(id: Long) = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:s".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val arrival = docs.sortBy { case (id, src, _) => (src, key(id), id) }
    val streamed = run(Seq(arrival), budgets.toMap)
      .map(a => (a.doc_id, a.source, a.tokens, a.cum_tokens)).toSet
    assert(streamed === batch, "stream/batch admission divergence")
  }
}
