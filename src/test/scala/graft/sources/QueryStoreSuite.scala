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

  test("percolate prunes the clause read to the batch vocabulary's buckets for ANY batch") {
    val dir = Files.createTempDirectory("graft_qstore_cap").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 64)
    qs.build(clauses)
    // the probe is a distributed distinct-tbucket aggregate (collect ≤
    // buckets ints), so pruning is unconditional — the plan of the
    // percolate result itself carries the tbucket partition predicate
    // and its file listing covers exactly the batch vocabulary's buckets
    val out = qs.percolate(docs, "doc_id", col("text"))
    val scans = out.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("clauses")))
    assert(scans.nonEmpty)
    assert(scans.forall(_.metadata("PartitionFilters").contains("tbucket")),
      "every clause scan must prune on tbucket at the partition level")
    // the listing covers exactly the INTERSECTION of the batch
    // vocabulary's buckets with the store's existing bucket dirs (a
    // batch term no stored query uses has no directory to list)
    val batchVocab = Seq("sort", "merge", "spark", "join", "bubble", "plain")
    val vocabBuckets = batchVocab.map(qs.bucketOf(_, 64)).toSet
    val storeBuckets = Seq("sort", "merge", "spark", "bubble", "join", "quokka")
      .map(qs.bucketOf(_, 64)).toSet
    val wantBuckets = (vocabBuckets & storeBuckets).toSeq.sorted
    val listed = scans.flatMap(s => s.relation.location
        .listFiles(s.partitionFilters, s.dataFilters)
        .map(_.values.getInt(0))).distinct.sorted
    assert(listed == wantBuckets,
      s"exactly the batch vocabulary's bucket dirs should list, got $listed want $wantBuckets")
    // an empty batch degenerates to the typed empty frame, no read at all
    assert(qs.percolate(docs.limit(0), "doc_id", col("text")).isEmpty)
  }

  test("percolateScored: fired pairs ≡ percolate, batch-relative BM25 scores (X246)") {
    val dir = Files.createTempDirectory("graft_qstore_scored").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    val fired = rows(qs.percolate(docs, "doc_id", col("text")))
      .map(t => (t._1, t._2)).toSet
    val scored = qs.percolateScored(docs, "doc_id", col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(scored.map(t => (t._1, t._2)).toSet === fired,
      "scoring must not change which pairs fire")
    assert(scored.forall(_._4 > 0.0), "every fired pair scores positive")
    // hand-computed alert1 × doc1: batch stats N=5, dls (3,4,4,3,3) ->
    // avgdl 3.4; matched terms sort(df 5), merge(df 4), spark(df 4),
    // each tf 1 in doc 1 (dl 3); must_not 'bubble' absent. The partial
    // is the engine's exact expression; the pair sum is decimal-exact.
    def partial(tf: Int, df: Int, dl: Int): BigDecimal = {
      val idf = math.log(1.0 + (5.0 - df + 0.5) / (df + 0.5))
      val norm = tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 3.4)
      BigDecimal(idf * tf * 2.2 / norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = (partial(1, 5, 3) + partial(1, 4, 3) + partial(1, 4, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = scored.find(t => t._1 == "alert1" && t._2 == 1L).get._4
    assert(got === want, s"alert1×doc1 score: got $got want $want")
    // empty batch degenerates to the typed empty frame
    assert(qs.percolateScored(docs.limit(0), "doc_id", col("text")).isEmpty)
    intercept[IllegalArgumentException](
      qs.percolateScored(docs, "doc_id", col("text"), minShould = 0))
  }

  test("percolateScored: staging pinned once, serve exchange-free on the doc axis") {
    val dir = Files.createTempDirectory("graft_qstore_scoredplan").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    val out = qs.percolateScored(docs, "doc_id", col("text"))
    // the (doc_id, term, __tf) staging frame is localCheckpoint-pinned:
    // the serve plan reads the pin, so the batch tokenize→explode ran
    // exactly once (at pin time) — no Generate anywhere in the result
    val analyzed = out.queryExecution.optimizedPlan.toString
    assert(!analyzed.contains("Generate"),
      s"tokenize must run once inside the pin, not per consumer:\n$analyzed")
    out.collect()
    // the full-width postings layout is declared exactly once (the
    // REPARTITION_BY_NUM exchange the dl window and enrichment ride);
    // the only other doc-keyed shuffle allowed is the stats branch's
    // map-side-combined per-doc collapse (~n_docs aggregated rows)
    val finalSection = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val docExchanges = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(doc_id") &&
        !l.contains("ReusedExchange"))
      .toList
    val declared = docExchanges.count(_.contains("REPARTITION_BY_NUM"))
    assert(declared == 1 && docExchanges.size <= 2,
      s"expected one declared postings exchange (+ at most the aggregated stats one), got:\n${docExchanges.mkString("\n")}\n$finalSection")
    graft.util.Pins.release(out)
  }

  test("maintain: policy acts on file accretion and tombstone mass; answers bit-identical (X186)") {
    val dir = Files.createTempDirectory("graft_qstore_maint").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 4)
    qs.build(clauses)
    // the appended alerts get tombstoned below, so post-maintenance
    // answers must equal the ORIGINAL store's
    val before = rows(qs.percolate(docs, "doc_id", col("text")))
    // append twice to accrete part-files in the touched buckets
    qs.append(Seq(("alert4", "sort", "must")).toDF("query_id", "term", "clause"))
    qs.append(Seq(("alert5", "merge", "must")).toDF("query_id", "term", "clause"))
    assert(qs.fileStats().agg(max(col("n_files"))).head().getInt(0) > 1)
    def report(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getBoolean(3)))).toMap
    // thresholds not crossed -> no action, report says so
    val idle = report(qs.maintain(maxFilesPerBucket = 100,
      maxTombstoneFrac = 0.9))
    assert(!idle("vacuum")._3 && !idle("compact")._3)
    assert(qs.fileStats().agg(max(col("n_files"))).head().getInt(0) > 1,
      "a no-op maintain must not compact")
    // tombstone 2 of 5 queries (0.4 > 0.2) and cross the file bar
    qs.delete(Seq("alert4", "alert5").toDF("query_id"))
    val busyDf = qs.maintain(maxFilesPerBucket = 1, maxTombstoneFrac = 0.2)
    val busy = report(busyDf)
    assert(busy("vacuum")._3 && busy("compact")._3)
    // self-verifying record: metric_after shows the actions cleared
    // their own triggers (tombstones gone, one file per bucket)
    val after = busyDf.collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(after("vacuum") === 0.0 && after("compact") === 1.0,
      s"post-action recheck must show cleared triggers: $after")
    assert(!new java.io.File(s"$dir/qs/tombstones").exists())
    assert(qs.fileStats().collect().forall(_.getInt(1) == 1),
      "compact leaves one file per bucket")
    assert(rows(qs.percolate(docs, "doc_id", col("text"))) === before,
      "maintenance must not change answers (appended alerts were tombstoned)")
    intercept[IllegalArgumentException](qs.maintain(maxFilesPerBucket = 0))
    intercept[IllegalArgumentException](qs.maintain(maxTombstoneFrac = 0.0))
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

  test("snapshot: byte-faithful copy, pending tombstones travel, sides independent, debris retried") {
    val dir = Files.createTempDirectory("graft_qstore_snap").toString
    val qs = new QueryStore(spark, s"$dir/qs", buckets = 8)
    qs.build(clauses)
    def fired(s: QueryStore) = rows(s.percolate(docs, "doc_id", col("text")))
    val want = fired(qs)
    qs.snapshot(s"$dir/a")
    val a = new QueryStore(spark, s"$dir/a", buckets = 8)
    assert(fired(a) === want, "snapshot must percolate exactly like the source")
    // tombstone on the copy: source untouched; a SECOND snapshot of the
    // copy carries the pending tombstone state faithfully
    a.delete(Seq("alert1").toDF("query_id"))
    assert(fired(qs) === want, "source must not see the copy's delete")
    a.snapshot(s"$dir/b")
    val b = new QueryStore(spark, s"$dir/b", buckets = 8)
    assert(fired(b) === fired(a), "pending tombstones must travel")
    b.vacuum()
    assert(fired(b) === fired(a), "vacuum on the copy keeps answers")
    assert(!fired(b).exists(_._1 == "alert1"))
    // target-exists is a refusal, not an overwrite
    intercept[IllegalArgumentException](qs.snapshot(s"$dir/a"))
    // crash protocol: hidden staging debris never blocks a clean retry
    val stale = new java.io.File(s"$dir/.c.snapstaging/junk")
    stale.getParentFile.mkdirs()
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    qs.snapshot(s"$dir/c")
    assert(fired(new QueryStore(spark, s"$dir/c", buckets = 8)) === want,
      "retry over staging debris must produce a clean snapshot")
    assert(!new java.io.File(s"$dir/.c.snapstaging").exists(),
      "staging renames away, leaving no hidden debris")
  }
}
