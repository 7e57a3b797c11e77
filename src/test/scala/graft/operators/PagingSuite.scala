package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Keyset pagination must walk the exact OFFSET sequence (total order),
  * with the cursor predicate reaching the scan as a pushed filter. */
class PagingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // duplicate first keys force the tiebreaker to matter
  private val rows = Seq(
    ("b", 4L), ("a", 2L), ("b", 1L), ("a", 7L), ("c", 3L),
    ("a", 5L), ("b", 9L), ("c", 1L), ("a", 1L), ("b", 2L))
    .toDF("grp", "id")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("chained pages tile the full ordering, disjoint and in order") {
    val keys = Seq(("grp", true), ("id", true))
    val full = collect(rows.orderBy(col("grp").asc, col("id").asc))
    var cursor: Option[Seq[Any]] = None
    val walked = Iterator.continually {
      val page = collect(Paging.keysetPage(rows, keys, cursor, 3))
      cursor = page.lastOption.map(p => Seq(p._1, p._2))
      page
    }.takeWhile(_.nonEmpty).toSeq.flatten
    assert(walked === full, "pages must concatenate to the full ordering")
  }

  test("descending keys page backwards through the order") {
    val keys = Seq(("grp", false), ("id", false))
    val page1 = collect(Paging.keysetPage(rows, keys, None, 4))
    assert(page1 === collect(rows.orderBy(col("grp").desc, col("id").desc))
      .take(4))
    val page2 = collect(Paging.keysetPage(rows, keys,
      Some(Seq(page1.last._1, page1.last._2)), 4))
    assert(page2 === collect(rows.orderBy(col("grp").desc, col("id").desc))
      .slice(4, 8))
  }

  test("cursor predicate pushes to the parquet scan; plan cuts with top-n") {
    val dir = java.nio.file.Files.createTempDirectory("graft_page").toString
    rows.write.parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    val page = Paging.keysetPage(t, Seq(("grp", true), ("id", true)),
      Some(Seq("b", 2L)), 3)
    val scan = page.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PushedFilters").contains("GreaterThan(grp"),
      s"cursor must reach the scan: ${scan.metadata("PushedFilters")}")
    assert(page.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "page cut must be a top-n, not sort-then-limit")
    assert(collect(page) === Seq(("b", 4L), ("b", 9L), ("c", 1L)))
  }

  test("bad arguments are rejected") {
    intercept[IllegalArgumentException](
      Paging.keysetPage(rows, Nil, None, 3))
    intercept[IllegalArgumentException](
      Paging.keysetPage(rows, Seq(("grp", true), ("grp", false)), None, 3))
    intercept[IllegalArgumentException](
      Paging.keysetPage(rows, Seq(("grp", true)), None, 0))
    intercept[IllegalArgumentException](
      Paging.keysetPage(rows, Seq(("grp", true)), Some(Seq("a", 1L)), 3))
  }
}
