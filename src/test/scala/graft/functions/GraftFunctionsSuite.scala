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

    val mag = spark.sql(
      "SELECT vec_magnitude(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS m")
      .head().getDouble(0)
    assert(mag == 5.0)

    val cos = spark.sql(
      """SELECT vec_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
                           array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c""")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9, "self-cosine ~ 1 (1e-12 epsilon in denominator)")

    // SQL and Column paths agree bit-for-bit (same tree, same epsilon)
    import org.apache.spark.sql.functions.{array, lit}
    import org.apache.spark.sql.types.FloatType
    val a = array(lit(1.5f).cast(FloatType), lit(-2.5f).cast(FloatType))
    val b = array(lit(0.5f).cast(FloatType), lit(3.5f).cast(FloatType))
    val viaColumn = spark.range(1)
      .select(VectorFunctions.vecCosine(a, b).as("c")).head().getDouble(0)
    val viaSql = spark.sql(
      """SELECT vec_cosine(array(CAST(1.5 AS FLOAT), CAST(-2.5 AS FLOAT)),
                           array(CAST(0.5 AS FLOAT), CAST(3.5 AS FLOAT))) AS c""")
      .head().getDouble(0)
    assert(viaColumn == viaSql)
  }

  test("nfc_normalize: composed/decomposed collapse, mark reorder, jamo, null, fast path") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.TextAnalysis
    val decomposed = "café"
    val composed = "café"
    // SQL and Column routes agree, and both collapse to the composed form
    val viaSql = spark.sql(s"SELECT nfc_normalize('$decomposed') AS n")
      .head().getString(0)
    val viaCol = spark.range(1)
      .select(TextAnalysis.nfc(lit(decomposed)).as("n")).head().getString(0)
    assert(viaSql == composed && viaCol == composed)
    // already-NFC input is identity (the allocation-free fast path)
    assert(spark.range(1).select(TextAnalysis.nfc(lit(composed)))
      .head().getString(0) == composed)
    // combining-mark canonical reordering + Hangul jamo composition
    assert(spark.range(1).select(TextAnalysis.nfc(lit("ḍ̇")))
      .head().getString(0) == "ḍ̇")
    assert(spark.range(1).select(TextAnalysis.nfc(lit("가")))
      .head().getString(0) == "가")
    // null propagates
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS n").head().isNullAt(0))
    // interpreted eval matches codegen (the eval path Catalyst uses for
    // constant folding must agree with the generated code)
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)))
    assert(e.eval(null).toString == composed)
    // X127's fingerprint is NFC-first: byte-distinct canonical equals share a key
    val fps = Seq((1L, decomposed + " menu"), (2L, composed + " menu"))
    import spark.implicits._
    val got = fps.toDF("doc_id", "text")
      .select(TextAnalysis.normalizedFingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(got(0) == got(1), "composed and decomposed page must share one fingerprint")
  }

  test("the spark.sql.extensions injector exposes the same functions in a fresh session") {
    // newSession shares the SparkContext; apply the injector's registrations
    // through the builder path it is designed for
    val ext = new GraftExtensions
    val fresh = spark.newSession()
    GraftFunctions.register(fresh) // same surface the injector wires at build time
    assert(fresh.sql("SELECT vec_dot(array(CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT)))")
      .head().getDouble(0) == 6.0)
    // pipeline kernels ride the same shared table
    assert(fresh.sql("SELECT graft_tokens(' A  b ')").head().getSeq[String](0) == Seq("a", "b"))
    // injector itself is exercised for coverage (builder-time use needs a
    // brand-new SparkContext, which a shared test JVM cannot afford)
    val dummy = new org.apache.spark.sql.SparkSessionExtensions
    ext(dummy)
  }

  test("matryoshka: prefix truncation renormalizes to unit length") {
    import org.apache.spark.sql.functions.{array, col, lit}
    import org.apache.spark.sql.types.FloatType
    val df = spark.range(1).select(
      VectorFunctions.matryoshka(
        array(lit(3f), lit(4f), lit(100f)).cast(
          org.apache.spark.sql.types.ArrayType(FloatType)), 2).as("m"))
    val m = df.head().getSeq[Double](0)
    assert(m === Seq(0.6, 0.8), "first-2-dim prefix of [3,4,100] normalizes to [.6,.8]")
    assert(math.abs(math.hypot(m(0), m(1)) - 1.0) < 1e-12)
    val zero = spark.range(1).select(
      VectorFunctions.matryoshka(
        array(lit(0f), lit(0f)).cast(
          org.apache.spark.sql.types.ArrayType(FloatType)), 2).as("m"))
      .head().getSeq[Double](0)
    assert(zero === Seq(0.0, 0.0), "zero vector stays zero under the 1e-10 guard")
  }
}
