package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // left: observations; right: state snapshots per key
  private lazy val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")),
    (2L, "a", ts("2024-01-01 12:00:00")),
    (3L, "a", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "b", ts("2024-01-01 12:00:00")), // exactly at a right row's time
    (5L, "c", ts("2024-01-01 12:00:00"))  // key with no right rows at all
  ).toDF("obs_id", "k", "t")

  private lazy val right = Seq(
    ("a", ts("2024-01-01 09:30:00"), 10.0),
    ("a", ts("2024-01-01 11:00:00"), 20.0),
    ("b", ts("2024-01-01 12:00:00"), 30.0),
    ("b", ts("2024-01-01 13:00:00"), 40.0)
  ).toDF("k", "rt", "v")

  private def run(tol: Option[org.apache.spark.sql.Column] = None): Map[Long, Option[Double]] =
    AsOf.asofJoin(left, right, "k", "t", "rt", Seq("v"), tol)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(r.fieldIndex("v"))) None
        else Some(r.getDouble(r.fieldIndex("v"))))).toMap

  test("each left row gets the latest right row at or before its time") {
    val got = run()
    assert(got(1L) == Some(10.0), "10:00 sees the 09:30 snapshot")
    assert(got(2L) == Some(20.0), "12:00 sees the 11:00 snapshot")
    assert(got(3L) == None, "09:00 precedes every right row")
    assert(got(4L) == Some(30.0), "match is inclusive: right row exactly at left time")
    assert(got(5L) == None, "key with no right rows stays null")
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == (left.columns.toSeq :+ "v"))
  }

  test("tolerance nulls out matches older than left.time - tol") {
    val got = run(Some(expr("INTERVAL 1 HOUR")))
    assert(got(1L) == Some(10.0), "09:30 is within 1h of 10:00")
    assert(got(2L) == Some(20.0), "11:00 is within 1h of 12:00")
    assert(got(4L) == Some(30.0), "zero staleness is within tolerance")
    val loose = run(Some(expr("INTERVAL 10 MINUTE")))
    assert(loose(1L) == None, "09:30 is staler than 10 minutes at 10:00")
  }

  test("rejects payload columns that collide with the left frame") {
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(left.withColumn("v", lit(0)), right, "k", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("already has"))
  }

  test("a null payload in the matched right row is returned as null, not an older value") {
    val r = Seq(
      ("a", ts("2024-01-01 09:00:00"), Some(10.0)),
      ("a", ts("2024-01-01 11:30:00"), None) // the matched row — null payload
    ).toDF("k", "rt", "v")
    val got = AsOf.asofJoin(left, r, "k", "t", "rt", Seq("v"))
      .filter($"obs_id" === 2L).head() // left at 12:00
    assert(got.isNullAt(got.fieldIndex("v")),
      "matched row's null must win over the older 09:00 value")
  }

  test("null keys and null right times never match (SQL ASOF semantics)") {
    val l = Seq((1L, Option.empty[String], ts("2024-01-01 12:00:00")),
      (2L, Some("a"), ts("2024-01-01 12:00:00"))).toDF("obs_id", "k", "t")
    val r = Seq(
      (Option.empty[String], Option(ts("2024-01-01 10:00:00")), 1.0), // null key
      (Some("a"), Option.empty[Timestamp], 2.0),                      // null time
      (Some("a"), Option(ts("2024-01-01 11:00:00")), 3.0)
    ).toDF("k", "rt", "v")
    val got = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("v"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(x.fieldIndex("v"))) None else Some(x.getDouble(x.fieldIndex("v"))))).toMap
    assert(got(1L) == None, "null left key matches nothing")
    assert(got(2L) == Some(3.0), "null-time right row is ignored, real row matches")
  }

  test("tolerance judges staleness of the MATCHED row, not of an older fallback") {
    val r = Seq(
      ("a", ts("2024-01-01 09:00:00"), Some(10.0)),
      ("a", ts("2024-01-01 11:55:00"), None) // matched, within tolerance, null payload
    ).toDF("k", "rt", "v")
    val got = AsOf.asofJoin(left, r, "k", "t", "rt", Seq("v"),
      Some(expr("INTERVAL 1 HOUR")))
      .filter($"obs_id" === 2L).head()
    assert(got.isNullAt(got.fieldIndex("v")),
      "the 09:00 value must not leak through the tolerance check")
  }

  test("differential: random data matches a brute-force as-of reference") {
    val rnd = new scala.util.Random(11)
    def time(h: Int) = ts(f"2024-01-01 ${h % 24}%02d:00:00")
    val lRows = (1L to 300L).map(i => (i, s"k${rnd.nextInt(8)}", time(rnd.nextInt(24))))
    val rRows = (1 to 120).map { i =>
      (s"k${rnd.nextInt(10)}", time(rnd.nextInt(24)), i.toDouble)
    }.distinct
      // unique per (key, time): keep max v like the operator contract asks
      .groupBy(r => (r._1, r._2)).map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
    val l = lRows.toDF("obs_id", "k", "t")
    val r = rRows.toDF("k", "rt", "v")

    val got = AsOf.asofJoin(l, r, "k", "t", "rt", Seq("v"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(x.fieldIndex("v"))) None else Some(x.getDouble(x.fieldIndex("v"))))).toMap

    lRows.foreach { case (id, k, t) =>
      val expected = rRows.filter(rr => rr._1 == k && !rr._2.after(t))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got(id) == expected, s"obs $id key $k at $t: got ${got(id)}, want $expected")
    }
  }

  test("plan shape: one shuffle on the key, no range-join blowup") {
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "must not plan a cross/range join")
    assert(plan.contains("Window"), "union+window rewrite expected")
  }

  test("forward: each left row gets the EARLIEST right row at or after its time") {
    val out = AsOf.asofJoinForward(left, right, "k", "t", "rt", Seq("rt", "v"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(3)), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // obs 1 (10:00, key a): next right at 11:00; obs 2 (12:00): none after
    assert(out(1L) == ((Some(ts("2024-01-01 11:00:00")), Some(20.0))))
    assert(out(2L) == ((None, None)), "no following right row -> null")
    // obs 3 (09:00): next is 09:30
    assert(out(3L) == ((Some(ts("2024-01-01 09:30:00")), Some(10.0))))
    // obs 4 at exactly a right instant: inclusive >=
    assert(out(4L) == ((Some(ts("2024-01-01 12:00:00")), Some(30.0))))
    assert(out(5L) == ((None, None)), "key with no right rows")
  }

  test("forward tolerance nulls matches farther ahead than left.time + tol") {
    val out = AsOf.asofJoinForward(left, right, "k", "t", "rt", Seq("v"),
        tolerance = Some(expr("INTERVAL 45 MINUTES")))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out(3L) == Some(10.0), "09:00 -> 09:30 is within 45 min")
    assert(out(1L) == None, "10:00 -> 11:00 is beyond 45 min")
  }

  test("nearest: closer side wins, tie goes backward, tolerance bounds both directions") {
    val out = AsOf.asofJoinNearest(left, right, "k", "t", "rt", Seq("rt", "v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    // obs 1 (10:00): prev 09:30 (30m) vs next 11:00 (60m) -> prev wins
    assert(out(1L) == Some(10.0))
    // obs 2 (12:00): prev 11:00, nothing after -> prev
    assert(out(2L) == Some(20.0))
    // obs 3 (09:00): nothing before, next 09:30 -> forward side
    assert(out(3L) == Some(10.0))
    // obs 4 at the exact instant: distance 0 both readings impossible —
    // backward match at 12:00 is distance 0, wins
    assert(out(4L) == Some(30.0))
    assert(out(5L) == None)
    // a tie at equal distance prefers the backward (already-known) row
    val l2 = Seq((1L, "a", ts("2024-01-01 10:15:00"))).toDF("id", "k", "t")
    val r2 = Seq(("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-01 10:30:00"), 2.0)).toDF("k", "rt", "v")
    val tie = AsOf.asofJoinNearest(l2, r2, "k", "t", "rt", Seq("v")).head()
    assert(tie.getDouble(3) == 1.0, "equal distance must prefer backward")
    // tolerance: 09:00 -> 09:30 is 30m; a 20m bound nulls it
    val tol = AsOf.asofJoinNearest(left, right, "k", "t", "rt", Seq("v"),
        tolerance = Some(expr("INTERVAL 20 MINUTES")))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(tol(3L) == None && tol(4L) == Some(30.0))
  }

  test("forward differential: random data matches a brute-force reference") {
    val rnd = new scala.util.Random(5)
    val l = (1 to 120).map(i => (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(1000)))
    val r = (1 to 80).map(_ => (s"k${rnd.nextInt(4)}", rnd.nextInt(1000), rnd.nextDouble()))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (key, time)
    val got = AsOf.asofJoinForward(l.toDF("id", "k", "t"), r.toDF("k", "rt", "v"),
        "k", "t", "rt", Seq("rt", "v"))
      .collect().map(x => x.getLong(0) ->
        ((Option(x.get(3)).map(_.asInstanceOf[Int]), Option(x.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    l.foreach { case (id, k, t) =>
      val want = r.filter(x => x._1 == k && x._2 >= t).sortBy(_._2).headOption
      assert(got(id) == ((want.map(_._2), want.map(_._3))), s"row $id ($k, $t)")
    }
  }

  test("interpolateJoin: linear between brackets, hold at edges, exact hit, empty key") {
    // numeric time axis (the operator's contract)
    val probes = Seq(
      (1L, "a", 100L),  // between 0 (v=10) and 200 (v=30) -> 20
      (2L, "a", 150L),  // -> 10 + 20*(150/200) = 25
      (3L, "a", -50L),  // before first reading -> hold 10
      (4L, "a", 500L),  // after last reading -> hold 30
      (5L, "a", 200L),  // exact hit -> 30
      (6L, "z", 100L)   // no readings -> null
    ).toDF("obs_id", "k", "t")
    val signal = Seq(("a", 0L, 10.0), ("a", 200L, 30.0))
      .toDF("k", "rt", "v")
    val out = AsOf.interpolateJoin(probes, signal, "k", "t", "rt", "v")
      .orderBy(col("obs_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(out.toSeq === Seq(
      1L -> Some(20.0), 2L -> Some(25.0), 3L -> Some(10.0),
      4L -> Some(30.0), 5L -> Some(30.0), 6L -> None))
    intercept[IllegalArgumentException](
      AsOf.interpolateJoin(probes.withColumn("interp", lit(1)),
        signal, "k", "t", "rt", "v"))
  }

  test("interpolate differential: random data matches a brute-force reference") {
    val rnd = new scala.util.Random(170)
    val sig = (0 until 30).map(i =>
      ("k" + rnd.nextInt(3), rnd.nextInt(1000).toLong, rnd.nextInt(100).toDouble))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (k, t)
    val prb = (1 to 40).map(i =>
      (i.toLong, "k" + rnd.nextInt(4), rnd.nextInt(1200).toLong - 100))
    def expected(k: String, t: Long): Option[Double] = {
      val ks = sig.filter(_._1 == k)
      val before = ks.filter(_._2 <= t).sortBy(_._2).lastOption
      val after = ks.filter(_._2 >= t).sortBy(_._2).headOption
      (before, after) match {
        case (None, None) => None
        case (None, Some((_, _, v))) => Some(v)
        case (Some((_, _, v)), None) => Some(v)
        case (Some((_, tb, vb)), Some((_, tf, vf))) =>
          if (tf == tb) Some(vb)
          else Some(vb + (vf - vb) * ((t.toDouble - tb.toDouble) / (tf.toDouble - tb.toDouble)))
      }
    }
    val got = AsOf.interpolateJoin(prb.toDF("obs_id", "k", "t"),
        sig.toDF("k", "rt", "v"), "k", "t", "rt", "v")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    prb.foreach { case (id, k, t) =>
      val want = expected(k, t).map(v =>
        BigDecimal.valueOf(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(got(id) === want, s"probe $id ($k, $t)")
    }
  }
}
