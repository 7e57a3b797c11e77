package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Ann

/** The persisted IVF index must be a pure I/O optimization: identical
  * results to the in-memory probe path, with the probe set reaching the
  * file listing as partition filters. */
class IvfIndexSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Array[Float])] =
    (1L to 64L).map(i => i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f))
  private lazy val embs = vecs.toDF("vec_id", "embedding")
  private lazy val cents: Seq[Array[Float]] = vecs.take(4).map(_._2)
  private val query: Array[Float] = Array.fill(8)(0.5f)

  private def freshIndex(): IvfIndex = {
    val dir = Files.createTempDirectory("graft_ivf_test").toString
    val idx = new IvfIndex(spark, s"$dir/ivf")
    idx.build(embs, "vec_id", "embedding", cents)
    idx
  }

  test("stored centroids round-trip in cid order") {
    val got = freshIndex().centroids()
    assert(got.size == cents.size)
    got.zip(cents).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("append parity: build(A) + append(B) searches identically to build(A ∪ B)") {
    val dir = Files.createTempDirectory("graft_ivf_append_test").toString
    val incremental = new IvfIndex(spark, s"$dir/inc")
    incremental.build(embs.filter($"vec_id" <= 32), "vec_id", "embedding", cents)
    incremental.append(embs.filter($"vec_id" > 32), "vec_id", "embedding")
    val full = freshIndex()
    for (nprobe <- Seq(1, 2, 4); k <- Seq(3, 10)) {
      val inc = incremental.search(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val all = full.search(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(inc == all, s"append diverged from full build at nprobe=$nprobe k=$k")
    }
    // a second append keeps compounding (the steady-state ingest loop)
    val more = Seq(100L -> Array.fill(8)(0.9f)).toDF("vec_id", "embedding")
    incremental.append(more, "vec_id", "embedding")
    val ids = incremental.search(query, 64 + 1, 4).collect().map(_.getLong(0))
    assert(ids.contains(100L), "the second batch's row must be probe-reachable")
  }

  test("delete parity: build(all) + delete(odds) searches identically to build(evens)") {
    val dir = Files.createTempDirectory("graft_ivf_delete_test").toString
    val deleted = new IvfIndex(spark, s"$dir/del")
    deleted.build(embs, "vec_id", "embedding", cents)
    deleted.delete(embs.filter($"vec_id" % 2 =!= 0).select($"vec_id".as("id")))
    val evens = new IvfIndex(spark, s"$dir/evens")
    evens.build(embs.filter($"vec_id" % 2 === 0), "vec_id", "embedding", cents)
    for (nprobe <- Seq(1, 2, 4); k <- Seq(3, 10)) {
      val got = deleted.search(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = evens.search(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"delete diverged from clean build at nprobe=$nprobe k=$k")
    }
    // deleting ids that do not exist is a no-op
    val before = deleted.search(query, 10, 4).collect().toSeq
    deleted.delete(Seq(99999L).toDF("id"))
    assert(deleted.search(query, 10, 4).collect().toSeq == before)
    // a fully-emptied list keeps the search working
    deleted.delete(embs.select($"vec_id".as("id")))
    assert(deleted.search(query, 10, 4).count() == 0L)
  }

  test("delete crash recovery: a half-done swap restores from the hidden backup") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_ivf_crash_test").toString
    val idx = new IvfIndex(spark, s"$dir/ivf")
    idx.build(embs, "vec_id", "embedding", cents)
    val before = idx.search(query, 10, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // simulate a crash between the two renames: live dir gone, backup left
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lists = s"$dir/ivf/lists"
    val victim = fs.globStatus(new Path(lists, "ivf_list=*")).head.getPath
    assert(fs.rename(victim, new Path(lists, "." + victim.getName + ".bak")))
    val after = idx.search(query, 10, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "search must restore the backed-up list first")
  }

  test("index search is bit-identical to the in-memory ivfTopK path") {
    val idx = freshIndex()
    for (nprobe <- Seq(1, 2, 4); k <- Seq(3, 10)) {
      val viaIndex = idx.search(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inMemory = Ann.ivfTopK(Ann.ivfAssign(embs, "embedding", cents),
          "vec_id", "embedding", cents, query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaIndex == inMemory, s"diverged at nprobe=$nprobe k=$k")
    }
  }

  test("PQ layout: searchPq is bit-identical to the in-memory ivfAdcTopK path") {
    val dir = Files.createTempDirectory("graft_ivfpq_test").toString
    val idx = new IvfIndex(spark, s"$dir/ivf")
    val books = graft.operators.Pq.seedCodebooks(embs, "vec_id", "embedding", m = 4, k = 4)
    idx.buildPq(embs, "vec_id", "embedding", cents, books)
    // stored codebooks round-trip
    val rt = idx.codebooks()
    assert(rt.length == books.length)
    rt.zip(books).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
    }
    for (nprobe <- Seq(1, 2, 4); k <- Seq(3, 10)) {
      val viaIndex = idx.searchPq(query, k, nprobe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val inMemory = graft.operators.Pq.ivfAdcTopK(embs, "vec_id", "embedding",
          cents, books, query, nprobe, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(viaIndex == inMemory, s"diverged at nprobe=$nprobe k=$k")
    }
    // the codes scan is partition-pruned AND never reads a vector column
    val frame = idx.searchPq(query, topK = 5, nprobe = 1)
    val scan = frame.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
      .find(_.metadata("Location").contains("codes"))
      .getOrElse(fail("no codes scan"))
    assert(scan.metadata("PartitionFilters").contains("ivf_list"))
    assert(!scan.metadata("ReadSchema").contains("vector"),
      "ADC must score codes, never the raw vectors")
  }

  test("the probe set reaches the scan as partition filters — pruned I/O") {
    val frame = freshIndex().search(query, k = 5, nprobe = 1)
    val scans = frame.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }
    val listScan = scans.find(_.metadata("Location").contains("lists"))
      .getOrElse(fail(s"no lists scan in:\n${frame.queryExecution.sparkPlan}"))
    val pf = listScan.metadata("PartitionFilters")
    assert(pf.contains("ivf_list"),
      s"probe must prune at the partition level, got PartitionFilters=$pf")
    // nprobe=1 of 4 lists: exactly one list directory survives pruning
    assert(listScan.relation.location.listFiles(
        listScan.partitionFilters, listScan.dataFilters).size == 1,
      "exactly one of the four list partitions should be read at nprobe=1")
  }
}
