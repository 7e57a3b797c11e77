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
}
