package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
    .toDF("id", "stratum")

  test("hashSample is deterministic and within a sane band of the rate") {
    val a = Sampling.hashSample(rows, col("id"), 0.2).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows, col("id"), 0.2).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same key set on every run")
    assert(math.abs(a.size - 400) < 120, s"~20% of 2000, got ${a.size}")
  }

  test("a higher rate is a superset of a lower rate (nested samples)") {
    val small = Sampling.hashSample(rows, col("id"), 0.1).select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(rows, col("id"), 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), "thresholding one hash nests samples by construction")
  }

  test("salt draws an independent sample") {
    val a = Sampling.hashSample(rows, col("id"), 0.2).select("id").collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(rows, col("id"), 0.2, salt = "run2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != c, "different salt, different membership")
  }

  test("stratified rates apply per stratum; zero rate empties a stratum") {
    val out = Sampling.stratifiedHashSample(rows, col("id"), col("stratum"),
      rates = Map("even" -> 0.5, "odd" -> 0.0), defaultRate = 1.0)
      .groupBy("stratum").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("odd"), "zero-rate stratum fully dropped")
    assert(math.abs(out("even") - 500) < 150, s"~50% of 1000 evens, got ${out.get("even")}")
  }

  test("rejects rates outside [0,1]") {
    intercept[IllegalArgumentException](Sampling.hashSample(rows, col("id"), 1.5))
    intercept[IllegalArgumentException](
      Sampling.stratifiedHashSample(rows, col("id"), col("stratum"), Map("even" -> -0.1), 0.5))
  }

  test("hashSplit: total, disjoint, deterministic, and near the requested fractions") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(rows, col("id"), fracs)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.values.sum === rows.count(), "every row gets exactly one label")
    assert(a.keySet === Set("train", "val", "test"))
    val n = rows.count().toDouble
    assert(math.abs(a("train") - 0.8 * n) < 0.1 * n && math.abs(a("val") - 0.1 * n) < 0.06 * n,
      a.toString)
    val b = Sampling.hashSplit(rows, col("id"), fracs)
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a2 = Sampling.hashSplit(rows, col("id"), fracs)
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(b === a2, "same key -> same split, forever")
    // the split respects the hashSample nesting property: train's bucket
    // range [0, 8000) IS the 0.8 sample
    val sampled = Sampling.hashSample(rows, col("id"), 0.8)
      .select("id").collect().map(_.getLong(0)).toSet
    val train = b.filter(_._2 == "train").map(_._1)
    assert(train === sampled)
  }

  test("hashSplit rejects bad fraction sets") {
    intercept[IllegalArgumentException](
      Sampling.hashSplit(rows, col("id"), Seq("a" -> 0.5, "b" -> 0.3)))
    intercept[IllegalArgumentException](Sampling.hashSplit(rows, col("id"), Nil))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(rows.withColumn("split", col("id")), col("id"),
        Seq("a" -> 1.0)))
  }

  test("stratifiedSplit: exact per-stratum proportions, deterministic, salt redraws") {
    val rows = (1L to 100L).map(i => (i, if (i <= 40) "big" else if (i <= 50) "ten" else "rest"))
      .toDF("id", "src")
    def splits(salt: String) = Sampling.stratifiedSplit(rows, col("id"), col("src"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val got = splits("s")
    def counts(stratum: String) = got.filter(_._2 == stratum).groupBy(_._3)
      .view.mapValues(_.length).toMap.withDefaultValue(0)
    // 40-row stratum: exactly 32/4/4; 10-row: exactly 8/1/1 (hashSplit
    // can miss these badly on small strata — this is the point of X93)
    assert(counts("big") == Map("train" -> 32, "val" -> 4, "test" -> 4).withDefaultValue(0),
      s"${counts("big")}")
    assert(counts("ten")("train") == 8 && counts("ten")("val") == 1 && counts("ten")("test") == 1)
    // deterministic under re-run; a different salt redraws membership
    assert(got.toSeq == splits("s").toSeq)
    val redrawn = splits("other")
    assert(redrawn.map(t => t._1 -> t._3).toMap != got.map(t => t._1 -> t._3).toMap,
      "salt change must redraw at least one assignment")
  }

  test("stratifiedSplit: seeded random strata — total, disjoint, boundary-exact counts") {
    val rnd = new scala.util.Random(99)
    val rows = (1L to 300L).map(i => (i, s"s${rnd.nextInt(7)}")).toDF("id", "src")
    val fracs = Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1)
    val got = Sampling.stratifiedSplit(rows, col("id"), col("src"), fracs, "pr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.length == 300, "every row assigned exactly once")
    // per-stratum counts must equal the integer boundary differences the
    // operator defines: round(0.7n), round(0.9...n)-round(0.7n), rest
    got.groupBy(_._2).foreach { case (_, g) =>
      val n = g.length
      val b1 = math.round(0.7 * n)
      val b2 = math.round((0.7 + 0.2) * n)
      val byS = g.groupBy(_._3).view.mapValues(_.length).toMap.withDefaultValue(0)
      assert(byS("train") == b1 && byS("val") == b2 - b1 && byS("test") == n - b2,
        s"stratum of $n rows split ${byS.toMap} vs boundaries ($b1, $b2)")
    }
  }

  test("stratifiedSplit rejects colliding column and bad fractions") {
    val rows = Seq((1L, "a")).toDF("id", "src")
    intercept[IllegalArgumentException](
      Sampling.stratifiedSplit(rows.withColumn("split", col("id")), col("id"), col("src"),
        Seq("a" -> 1.0)))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSplit(rows, col("id"), col("src"), Seq("a" -> 0.5, "b" -> 0.4)))
  }
}
