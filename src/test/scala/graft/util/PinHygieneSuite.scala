package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{CorpusStats, Dedup, Sessionize}

/** Long-session pin hygiene: operators that localCheckpoint working sets
  * must not let dead pins accrete across repeated calls (round 7 measured
  * otherwise-1-3s queries recording 15-50s once enough pins piled up in
  * one JVM). Suites share the TestSpark JVM and may run concurrently, so
  * every assertion is a TOLERANT DELTA — loose enough for a few pins of
  * concurrent-suite noise, tight enough that the old unbounded behavior
  * (one-or-more pins left per call or per CC round) still fails it. */
class PinHygieneSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pinCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("dedupGroups: per-round and edge pins are released; caller frees the result pin") {
    // a 40-node chain forces several CC rounds (diameter-bound iterations)
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val before = pinCount
    val g = Dedup.dedupGroups(pairs)
    assert(g.count() == 40)
    // old behavior: edge pin + every round's labels pin survive (6+ pins);
    // new behavior: exactly the final round's backing pin
    assert(pinCount - before <= 3, s"internal pins leaked: $before -> $pinCount")
    Pins.release(g)
    assert(pinCount - before <= 2, s"caller release did not free the result pin")
  }

  test("repeated dedupGroups with caller release keeps the pin count bounded") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val before = pinCount
    (1 to 6).foreach { _ =>
      val g = Dedup.dedupGroups(pairs)
      g.count()
      Pins.release(g)
    }
    // old behavior grows by >= 3 pins per call (18+ here)
    assert(pinCount - before <= 4, s"pins accreted across calls: $before -> $pinCount")
  }

  test("vocabCoverage releases its census pin internally (eager result)") {
    val docs = Seq((1L, "a b c a a"), (2L, "b d e")).toDF("doc_id", "text")
    val before = pinCount
    val ladders = (1 to 4).map { _ =>
      CorpusStats.vocabCoverage(docs, $"text", ladder = Seq(1, 2, 10)).collect()
    }
    // results stay valid after the pin release (eager materialization)
    assert(ladders.forall(_.length == 3))
    assert(pinCount - before <= 2, s"census pins leaked: $before -> $pinCount")
  }

  test("Pins.release frees the funnel's pinned event slice after the last consumer") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "view"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "buy"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "view"))
      .toDF("user_id", "ts", "event_type")
    val before = pinCount
    val f = Sessionize.funnel(ev, $"user_id", $"ts", $"event_type", Seq("view", "buy"))
    assert(f.count() == 2)
    Pins.release(f)
    assert(pinCount - before <= 1, s"funnel event pin survived release: $before -> $pinCount")
  }

  test("release discipline: no released checkpoint is ever recomputed (r21 verdict audit)") {
    // The `lineage has been truncated and cannot be recomputed after
    // unpersisting` warning is logged for EVERY unpersist of a local
    // checkpoint — correct uses included. The failure mode it warns
    // about is a consumer touching a released block, which aborts the
    // job with a missing-checkpoint-block SparkException. This row
    // drives the heaviest release choreography in the engine — an
    // inverted-index append (shared lazily-checkpointed dl/tf
    // aggregates, released after four staged writes) followed by every
    // class of consumer those frames fed — and asserts the whole walk
    // completes: any release-before-last-use would throw here, and a
    // zero-failed-job listener pins that nothing retried either.
    val failed = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        j.jobResult match {
          case org.apache.spark.scheduler.JobSucceeded => ()
          case _ => failed.incrementAndGet(); ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = (1L to 40L).map(i =>
        (i, s"alpha beta w$i gamma " + ("delta " * (i % 3).toInt)))
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_release_audit").toString
      val idx = new graft.sources.InvertedIndex(spark, s"$dir/inv")
      idx.build(docs.filter($"doc_id" % 2 === 0), "doc_id", expr("text"))
      idx.buildDerived(headLen = 4)
      idx.append(docs.filter($"doc_id" % 2 =!= 0), "doc_id", expr("text"))
      // consumers of everything the append staged: postings serve,
      // block-max serve, fielded serve, forward serve, then the
      // maintenance pass that applies/rebuilds the deltas
      assert(idx.bm25(Seq("alpha", "beta"), k = 5).count() == 5)
      assert(idx.bm25MaxScore(Seq("alpha", "gamma"), k = 5).count() == 5)
      assert(idx.bm25fTopK(Seq("alpha"), k = 5).count() == 5)
      assert(idx.moreLikeThis(2L, k = 5).count() > 0)
      val acted = idx.maintainDerivedVerbose(maxStaleFrac = 0.1)
        .select("artifact", "acted").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(acted.values.forall(identity), s"fixture must drift: $acted")
      assert(idx.bm25(Seq("alpha", "beta"), k = 5).count() == 5)
      // drain the async listener bus before reading the counter
      var spins = 0
      while (failed.get() == 0 && spins < 20) { Thread.sleep(50); spins += 1 }
      assert(failed.get() == 0,
        s"${failed.get()} Spark jobs failed during the release walk — " +
          "a released checkpoint was touched")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
