package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** The persisted stored-query table must percolate exactly like the
  * in-memory operator, with stored-clause I/O pruned to the batch
  * vocabulary's term buckets and the subscribe/unsubscribe lifecycle
  * live on the next read. */
class QueryStoreSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    1L -> "sort merge spark",
    2L -> "sort merge join spark",
    3L -> "sort merge bubble spark",
    4L -> "sort merge plain",
    5L -> "sort spark join").toDF("doc_id", "text")

  private def clauses = Seq(
    ("alert1", "sort", "must"), ("alert1", "merge", "must"),
    ("alert1", "spark", "should"), ("alert1", "bubble", "must_not"),
    ("alert2", "join", "must"),
    ("alert3", "quokka", "must")).toDF("query_id", "term", "clause")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("stored percolate ≡ in-memory percolate; validation at build") {
    val dir = Files.createTempDirectory("graft_qstore").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    val want = rows(TextAnalysis.percolate(docs, "doc_id", col("text"), clauses))
    assert(rows(qs.percolate(docs, "doc_id", col("text"))) === want)
    assert(want.nonEmpty)
    // minShould threads through to the same gate
    assert(rows(qs.percolate(docs, "doc_id", col("text"), minShould = 2)) ===
      rows(TextAnalysis.percolate(docs, "doc_id", col("text"), clauses,
        minShould = 2)))
    // the clause contract validates at build time
    intercept[IllegalArgumentException](
      qs.build(Seq(("q", "x", "nope")).toDF("query_id", "term", "clause")))
    intercept[IllegalArgumentException](
      qs.build(Seq(("q", "x", "must_not")).toDF("query_id", "term", "clause")))
  }

  test("adaptive pruning: over-cap batch vocabulary serves unpruned, same matches") {
    val dir = Files.createTempDirectory("graft_qstore_cap").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    val want = rows(qs.percolate(docs, "doc_id", col("text")))
    // the batch vocabulary (8 terms) exceeds a cap of 3: the membership
    // join runs against the full live clause table — same result set
    val capped = qs.percolate(docs, "doc_id", col("text"), maxPruneTerms = 3)
    assert(rows(capped) === want)
    // and the capped plan carries NO tbucket file-listing restriction
    // (all clause partitions eligible — the equi-join restricts terms)
    val scans = capped.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("clauses")))
    assert(scans.nonEmpty)
    assert(!scans.map(_.metadata("PartitionFilters")).mkString.contains("tbucket IN"),
      "an over-cap batch must not build the bucket predicate")
    intercept[IllegalArgumentException](
      qs.percolate(docs, "doc_id", col("text"), maxPruneTerms = 0))
  }

  test("lifecycle: append / tombstone delete / vacuum all live on the next read") {
    val dir = Files.createTempDirectory("graft_qstore_life").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    // subscribe a new alert: next percolate sees it
    qs.append(Seq(("alert4", "plain", "must")).toDF("query_id", "term", "clause"))
    val withNew = rows(qs.percolate(docs, "doc_id", col("text")))
    assert(withNew.exists(_._1 == "alert4"), "appended alert must fire")
    val allClauses = clauses.union(
      Seq(("alert4", "plain", "must")).toDF("query_id", "term", "clause"))
    assert(withNew === rows(TextAnalysis.percolate(docs, "doc_id",
      col("text"), allClauses)))
    // unsubscribe: tombstone masks on the very next read
    qs.delete(Seq("alert1").toDF("query_id"))
    val masked = rows(qs.percolate(docs, "doc_id", col("text")))
    assert(!masked.exists(_._1 == "alert1"), "tombstoned alert must not fire")
    // vacuum: physical removal, same answers, totals consistent
    qs.vacuum()
    assert(rows(qs.percolate(docs, "doc_id", col("text"))) === masked)
    assert(qs.liveTotals.filter(col("query_id") === "alert1").isEmpty)
    assert(qs.liveClauses.filter(col("query_id") === "alert1").isEmpty)
  }

  test("a query whose must term is outside the batch vocabulary cannot fire") {
    // 'quokka' (alert3) appears in no document: the pruned slice holds
    // no row for it, and the totals gate keeps it silent rather than
    // letting a partial slice under-count its requirements
    val dir = Files.createTempDirectory("graft_qstore_abs").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses.union(
      Seq(("alert5", "sort", "must"), ("alert5", "quokka", "must"))
        .toDF("query_id", "term", "clause")))
    val got = rows(qs.percolate(docs, "doc_id", col("text")))
    assert(!got.exists(r => r._1 == "alert3" || r._1 == "alert5"),
      "queries with unmatched must terms must stay silent")
  }

  test("SQL-registered query store is LIVE: append/delete visible, anti-join mask, no re-registration") {
    val dir = Files.createTempDirectory("graft_qstore_sql").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    new StoreCatalog(spark).registerQueryStore("qsql", s"$dir/qs")
    def ids() = spark.sql("SELECT DISTINCT query_id FROM qsql_clauses")
      .collect().map(_.getString(0)).toSet
    assert(ids() == Set("alert1", "alert2", "alert3"))
    qs.append(Seq(("alert4", "plain", "must")).toDF("query_id", "term", "clause"))
    assert(ids().contains("alert4"), "appended alert invisible to the view")
    qs.delete(Seq("alert1").toDF("query_id"))
    assert(!ids().contains("alert1"), "tombstoned alert visible through the view")
    assert(spark.sql(
      "SELECT n_must FROM qsql_totals WHERE query_id = 'alert2'")
      .head().getLong(0) == 1L)
    // the mask is a plan-level anti-join of live V2 scans, never a Set
    val plan = spark.sql("SELECT * FROM qsql_clauses")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected the anti-join mask in:\n$plan")
  }

  test("stored-clause read prunes to the batch vocabulary's buckets at the file listing") {
    val dir = Files.createTempDirectory("graft_qstore_prune").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    val frame = qs.clausesForTerms(Seq("sort"))
    val scan = frame.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PartitionFilters").contains("tbucket"),
      s"bucket must prune at the partition level: ${scan.metadata("PartitionFilters")}")
    val wantBucket = qs.bucketOf("sort", 8)
    val dirs = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      .map(_.values.getInt(0)).distinct
    assert(dirs == Seq(wantBucket),
      s"exactly the term's bucket directory should be read, got $dirs")
  }
}
