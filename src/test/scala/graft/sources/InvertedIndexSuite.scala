package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** The persisted inverted index must be a pure I/O optimization:
  * bit-identical phrase results to the in-memory postings path, with the
  * term buckets reaching the file listing as partition filters. */
class InvertedIndexSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docsA = Seq(
    (1L, "merge sort beats bubble sort"),
    (2L, "sort merge join strategy"),
    (3L, "unrelated text entirely")).toDF("doc_id", "text")
  private val docsB = Seq(
    (4L, "another sort merge document"),
    (5L, "no match here")).toDF("doc_id", "text")

  private def phrase(idx: InvertedIndex, terms: Seq[String]) =
    TextAnalysis.phraseMatch(idx.termPostings(terms), terms)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("phrase over the persisted index is bit-identical to the in-memory path") {
    val dir = Files.createTempDirectory("graft_inv").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 8)
    idx.build(docsA, "doc_id", col("text"))
    val want = TextAnalysis.phraseMatch(
        TextAnalysis.positionalPostings(docsA, "doc_id", col("text")),
        Seq("sort", "merge"))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(phrase(idx, Seq("sort", "merge")) === want)
    intercept[IllegalArgumentException](idx.termPostings(Nil))
    intercept[IllegalArgumentException](idx.termPostings(Seq("ok", "")))
  }

  test("append: build(A) + append(B) answers like build(A ∪ B)") {
    val dir = Files.createTempDirectory("graft_inv_app").toString
    val inc = new InvertedIndex(spark, s"$dir/inc", buckets = 8)
    inc.build(docsA, "doc_id", col("text"))
    inc.append(docsB, "doc_id", col("text"))
    val full = new InvertedIndex(spark, s"$dir/full", buckets = 8)
    full.build(docsA.union(docsB), "doc_id", col("text"))
    assert(phrase(inc, Seq("sort", "merge")) === phrase(full, Seq("sort", "merge")))
  }

  test("bm25 over the index is bit-identical to the tokenize path; append keeps stats honest") {
    val dir = Files.createTempDirectory("graft_inv_bm25").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 8)
    idx.build(docsA, "doc_id", col("text"))
    idx.append(docsB, "doc_id", col("text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = rows(TextAnalysis.bm25TopK(docsA.union(docsB), "doc_id",
      col("text"), Seq("sort", "merge"), k = 10))
    val got = rows(idx.bm25(Seq("sort", "merge"), k = 10))
    assert(got === want, "index path must reproduce the tokenize path exactly")
    intercept[IllegalArgumentException](idx.bm25(Nil, 5))
    intercept[IllegalArgumentException](idx.bm25(Seq("a", "a"), 5))
    intercept[IllegalArgumentException](idx.bm25(Seq("a"), 0))
  }

  test("term lookup prunes to the queried buckets at the file listing") {
    val dir = Files.createTempDirectory("graft_inv_prune").toString
    val idx = new InvertedIndex(spark, s"$dir/inv", buckets = 8)
    idx.build(docsA, "doc_id", col("text"))
    val frame = idx.termPostings(Seq("sort"))
    val scan = frame.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PartitionFilters").contains("tbucket"),
      s"bucket must prune at the partition level: ${scan.metadata("PartitionFilters")}")
    val wantBucket = idx.bucketOf("sort", 8)
    val dirs = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
      .map(_.values.getInt(0)).distinct
    assert(dirs == Seq(wantBucket),
      s"exactly the term's bucket directory should be read, got $dirs")
  }
}
