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
}
