package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packAssignments: dense prefix sum in order, pack boundaries correct") {
    // token counts 60,50,30,80,10 with capacity 100:
    // before: 0,60,110,140,220 -> packs 0,0,1,1,2; doc 2 spans 0->1 (60..109)
    val docs = Seq((1L, 60L), (2L, 50L), (3L, 30L), (4L, 80L), (5L, 10L))
      .toDF("doc_id", "n_tokens").repartition(3)
    val out = Packing.packAssignments(docs, "doc_id", "n_tokens", 100L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 60L, 0L, 1L), (3L, 110L, 1L, 1L),
      (4L, 140L, 1L, 2L), (5L, 220L, 2L, 2L)))
  }

  test("packAssignments handles zero-token docs and is partitioning-invariant") {
    val a = Packing.packAssignments(
      Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("doc_id", "n_tokens").repartition(1),
      "doc_id", "n_tokens", 4L).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Packing.packAssignments(
      Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("doc_id", "n_tokens").repartition(5),
      "doc_id", "n_tokens", 4L).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "result independent of input partitioning")
    // doc 2 occupies tokens 0..4 -> starts pack 0, ends pack 1
    assert(a(1) == Seq(2L, 5L, 0L, 0L, 1L))
    // zero-token doc 3 sits at boundary 5 -> pack 1, pack_last 1
    assert(a(2) == Seq(3L, 0L, 5L, 1L, 1L))
  }

  test("rejects non-positive capacity") {
    intercept[IllegalArgumentException](
      Packing.packAssignments(Seq((1L, 1L)).toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 0L))
  }

  test("property: prefix-sum invariant holds on random sizes and partitionings") {
    val rnd = new scala.util.Random(13)
    val counts = (1L to 500L).map(i => i -> rnd.nextInt(300).toLong)
    val df = counts.toDF("doc_id", "n_tokens").repartition(rnd.nextInt(7) + 2)
    val out = Packing.packAssignments(df, "doc_id", "n_tokens", 1000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    var running = 0L
    out.foreach { case (id, n, before, pack, packLast) =>
      assert(before == running, s"doc $id: tokens_before $before != $running")
      assert(pack == before / 1000L)
      assert(packLast == (if (n > 0) (before + n - 1) / 1000L else before / 1000L))
      running += n
    }
    assert(running == counts.map(_._2).sum)
  }

  test("null token counts fail with a clear message, not an opaque NPE") {
    val docs = Seq((1L, Some(5L)), (2L, Option.empty[Long])).toDF("doc_id", "n_tokens")
    val e = intercept[org.apache.spark.SparkException] {
      Packing.packAssignments(docs, "doc_id", "n_tokens", 10L).collect()
    }
    assert(e.getMessage.contains("n_tokens") ||
      Option(e.getCause).exists(_.getMessage.contains("n_tokens")),
      s"error must name the column: ${e.getMessage}")
  }
}
