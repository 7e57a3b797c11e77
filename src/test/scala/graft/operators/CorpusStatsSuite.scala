package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusStatsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extendedStats: hand-computed population variance; nulls excluded (X243)") {
    // key a: 2, 4, 6 -> n=3, sum=12, avg=4, var=((4+0+4)/3)=8/3, std=sqrt
    val df = Seq(("a", Some(2.0)), ("a", Some(4.0)), ("a", Some(6.0)),
      ("a", None), ("b", Some(5.0))).toDF("k", "v")
    val got = CorpusStats.extendedStats(df, $"k", $"v")
      .orderBy($"key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSeq
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      ("a", 3L, 2.0, 6.0, 12.0, 4.0, r6(8.0 / 3.0), r6(math.sqrt(
        (56.0 / 3.0) - 16.0))),
      ("b", 1L, 5.0, 5.0, 5.0, 5.0, 0.0, 0.0)))
  }

  test("adjacencyMatrix: singleton + pair counts, empty buckets omitted, contract (X250)") {
    import spark.implicits._
    val df = Seq(
      ("en", 500L), ("en", 2000L), ("en", 3000L),
      ("fr", 2500L), ("fr", 100L), ("zh", 50L)).toDF("lang", "n")
    val got = CorpusStats.adjacencyMatrix(df, Seq(
        "en" -> (col("lang") === "en"),
        "long" -> (col("n") > 1000L),
        "zh" -> (col("lang") === "zh")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "en" -> 3L, "long" -> 3L, "zh" -> 1L, "en&long" -> 2L))
    // 'en&zh' and 'long&zh' are empty -> omitted (the ES convention)
    assert(!got.contains("en&zh") && !got.contains("long&zh"))
    intercept[IllegalArgumentException](
      CorpusStats.adjacencyMatrix(df, Nil))
    intercept[IllegalArgumentException](CorpusStats.adjacencyMatrix(df,
      Seq("a" -> lit(true), "a" -> lit(false))))
    intercept[IllegalArgumentException](CorpusStats.adjacencyMatrix(df,
      Seq("a&b" -> lit(true))))
  }

  test("dateRangeAgg: [from,to) timestamp buckets, overlap, empty emits, nulls drop (X274)") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(Some(ts("2024-01-05 00:00:00")),
      Some(ts("2024-01-15 12:00:00")), Some(ts("2024-02-01 00:00:00")),
      Some(ts("2024-02-10 00:00:00")), None).toDF("t")
    val got = CorpusStats.dateRangeAgg(df, col("t"), Seq(
        (Some("2024-01-01 00:00:00"), Some("2024-02-01 00:00:00")),
        (Some("2024-01-10 00:00:00"), None),              // overlaps Jan
        (None, Some("2024-01-01 00:00:00")),              // empty, still emits
        (Some("2024-02-01 00:00:00"), Some("2024-03-01 00:00:00"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      // Feb 1 exactly: excluded from Jan (to is exclusive), in Feb
      "2024-01-01 00:00:00-2024-02-01 00:00:00" -> 2L,
      "2024-01-10 00:00:00-*" -> 3L,
      "*-2024-01-01 00:00:00" -> 0L,
      "2024-02-01 00:00:00-2024-03-01 00:00:00" -> 2L))
    intercept[IllegalArgumentException](
      CorpusStats.dateRangeAgg(df, col("t"), Nil))
    intercept[IllegalArgumentException](CorpusStats.dateRangeAgg(df, col("t"),
      Seq((None, None))))
    intercept[IllegalArgumentException](CorpusStats.dateRangeAgg(df, col("t"),
      Seq((Some("2024-02-01 00:00:00"), Some("2024-01-01 00:00:00")))))
  }

  test("filtersAgg: every named bucket emits (zero included), other bucket, null rows (X269)") {
    import spark.implicits._
    val df = Seq(
      ("en", Some(500L)), ("en", Some(2000L)), ("fr", Some(2500L)),
      ("zh", Some(50L)), ("de", None)).toDF("lang", "n")
    val got = CorpusStats.filtersAgg(df, Seq(
        "en" -> (col("lang") === "en"),
        "long" -> (col("n") > 1000L),
        "ja" -> (col("lang") === "ja")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'ja' matches nothing but STILL emits — unlike adjacencyMatrix,
    // a keyed filter is part of the requested output shape
    assert(got === Map("en" -> 2L, "long" -> 2L, "ja" -> 0L))
    // other bucket: rows matching NO filter — zh (all false) and the
    // null-n de row (null predicates pin to other, the ES rule)
    val withOther = CorpusStats.filtersAgg(df, Seq(
        "en" -> (col("lang") === "en"),
        "long" -> (col("n") > 1000L)),
      otherBucketKey = Some("rest"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withOther === Map("en" -> 2L, "long" -> 2L, "rest" -> 2L))
    intercept[IllegalArgumentException](CorpusStats.filtersAgg(df, Nil))
    intercept[IllegalArgumentException](CorpusStats.filtersAgg(df,
      Seq("a" -> lit(true), "a" -> lit(false))))
    intercept[IllegalArgumentException](CorpusStats.filtersAgg(df,
      Seq("a" -> lit(true)), otherBucketKey = Some("a")))
  }

  test("rareTerms: the df-bounded long tail of a census; contract (X251)") {
    import spark.implicits._
    val census = Seq(("the", 100L), ("sort", 5L), ("quokka", 1L),
      ("bezoar", 2L)).toDF("term", "df")
    val got = CorpusStats.rareTerms(census, maxDocCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got === Seq(("bezoar", 2L), ("quokka", 1L)))
    intercept[IllegalArgumentException](CorpusStats.rareTerms(census, 0))
  }

  test("termsAggWithOther: top-N + reconciling other row; no row when nothing dropped (X253)") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c", "d").toDF("src")
    val got = CorpusStats.termsAggWithOther(df, col("src"), size = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(t => (-t._2, t._1))
    assert(got === Seq(("a", 3L), ("__sum_other__", 2L), ("b", 2L)))
    // total reconciles: top + other == corpus
    assert(got.map(_._2).sum === 7L)
    // size covering every bucket drops the sentinel row
    val all = CorpusStats.termsAggWithOther(df, col("src"), size = 10)
      .collect().map(_.getString(0)).toSet
    assert(all === Set("a", "b", "c", "d"))
    // count tie at the cut: key asc wins deterministically
    val tied = CorpusStats.termsAggWithOther(
        Seq("x", "y").toDF("src"), col("src"), size = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    assert(tied === Seq(("__sum_other__", 1L), ("x", 1L)))
    intercept[IllegalArgumentException](
      CorpusStats.termsAggWithOther(df, col("src"), 0))
    intercept[IllegalArgumentException](CorpusStats.termsAggWithOther(
      Seq("__sum_other__").toDF("src"), col("src"), 1))
  }

  test("rangeAgg: open ends, overlap double-counts, empty range emits, nulls match nothing (X254)") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, 5.0, 10.0, 50.0, 99.0, 150.0, null)
      .toDF("v")
    val got = CorpusStats.rangeAgg(df, col("v"), Seq(
        (None, Some(10.0)), (Some(10.0), Some(100.0)), (Some(100.0), None),
        (Some(5.0), Some(60.0)), (Some(1000.0), None)))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map(
      "*-10" -> 2L,       // 1, 5 (10 excluded: [from, to))
      "10-100" -> 3L,     // 10, 50, 99
      "100-*" -> 1L,      // 150
      "5-60" -> 3L,       // 5, 10, 50 — overlap double-counts
      "1000-*" -> 0L))    // empty range still emits
    intercept[IllegalArgumentException](CorpusStats.rangeAgg(df, col("v"), Nil))
    intercept[IllegalArgumentException](
      CorpusStats.rangeAgg(df, col("v"), Seq((None, None))))
    intercept[IllegalArgumentException](
      CorpusStats.rangeAgg(df, col("v"), Seq((Some(9.0), Some(3.0)))))
  }

  test("percentileRanks: exact empirical CDF per key, nulls excluded (X262)") {
    import spark.implicits._
    val df = Seq(("a", Some(5.0)), ("a", Some(10.0)), ("a", Some(20.0)),
      ("a", None), ("b", Some(1.0))).toDF("k", "v")
    val got = CorpusStats.percentileRanks(df, col("k"), col("v"),
        Seq(10.0, 15.0))
      .orderBy(col("key"), col("x")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      ("a", 10.0, 3L, 66.666667), // 5 and 10 are <= 10 (right-continuous)
      ("a", 15.0, 3L, 66.666667),
      ("b", 10.0, 1L, 100.0), ("b", 15.0, 1L, 100.0)))
    intercept[IllegalArgumentException](
      CorpusStats.percentileRanks(df, col("k"), col("v"), Nil))
    intercept[IllegalArgumentException](
      CorpusStats.percentileRanks(df, col("k"), col("v"), Seq(1.0, 1.0)))
  }

  test("matrixStats: hand-computed covariance/correlation; degenerate column; row-wise nulls (X264)") {
    import spark.implicits._
    // a = (1,2,3), b = (2,4,6): perfectly correlated
    val df = Seq((Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (Some(3.0), Some(6.0)), (None, Some(9.0)), (Some(9.0), None))
      .toDF("a", "b")
    val r = CorpusStats.matrixStats(df, col("a"), col("b")).head()
    assert(r.getLong(0) === 3L, "rows missing either field are excluded")
    assert(r.getDouble(1) === 2.0 && r.getDouble(2) === 4.0)
    assert(r.getDouble(3) === round6d(2.0 / 3.0) &&
      r.getDouble(4) === round6d(8.0 / 3.0))
    assert(r.getDouble(5) === round6d(4.0 / 3.0))
    assert(r.getDouble(6) === 1.0, "perfect linear relation -> corr 1")
    // a constant column: variance 0, correlation defined as 0
    val c = CorpusStats.matrixStats(
      Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b"), col("a"), col("b")).head()
    assert(c.getDouble(4) === 0.0 && c.getDouble(6) === 0.0)
  }

  private def round6d(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("welchTTest: hand-computed statistic; undefined cases null (X268)") {
    import spark.implicits._
    // A: 1,2,3 (mean 2, s²=1); B: 5,7 (mean 6, s²=2)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0),
      ("b", 7.0), ("c", 99.0)).toDF("g", "v")
    val r = CorpusStats.welchTTest(df, col("v"),
      col("g") === "a", col("g") === "b").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 2.0 && r.getDouble(3) === 6.0)
    val want = BigDecimal((2.0 - 6.0) / math.sqrt(1.0 / 3.0 + 2.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === want)
    // a singleton sample: variance undefined -> null t
    val single = CorpusStats.welchTTest(df, col("v"),
      col("g") === "a", col("g") === "c").head()
    assert(single.isNullAt(4))
    // two constant samples: zero denominator -> null t
    val const = CorpusStats.welchTTest(
      Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v"),
      col("v"), col("g") === "a", col("g") === "b").head()
    assert(const.isNullAt(4))
  }

  test("weightedAvg: hand-computed, row-wise nulls, zero-weight key -> null (X265)") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(10.0), Some(1.0)), ("a", Some(20.0), Some(3.0)),
      ("a", None, Some(9.0)), ("a", Some(99.0), None), // row-wise excluded
      ("z", Some(5.0), Some(0.0))).toDF("k", "v", "w")
    val got = CorpusStats.weightedAvg(df, col("k"), col("v"), col("w"))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    // a: (10·1 + 20·3)/(1+3) = 17.5; z: Σw = 0 -> null
    assert(got === Seq(("a", 2L, Some(17.5)), ("z", 1L, None)))
  }

  test("exact quantiles interpolate like quantile_cont on a hand-checked fixture") {
    // values 10,20,30,40: p25 = 17.5, p50 = 25.0, p95 = 38.5
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L)).toDF("k", "v")
    val r = CorpusStats.lengthStats(df, $"k", $"v").collect().head
    assert(r.getLong(r.fieldIndex("n")) === 4L)
    assert(r.getDouble(r.fieldIndex("mean")) === 25.0)
    assert(r.getDouble(r.fieldIndex("p25")) === 17.5)
    assert(r.getDouble(r.fieldIndex("p50")) === 25.0)
    assert(r.getDouble(r.fieldIndex("p95")) === 38.5)
  }

  test("vocabStats: exact counts on a fixture; HLL sketch within rsd of exact on real data") {
    val df = Seq((1L, "x", "a b a"), (2L, "x", "b c"), (3L, "y", "z")).toDF("id", "k", "t")
    val exact = CorpusStats.vocabStats(df, $"k", "id", $"t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(exact === Map("x" -> ((2L, 5L, 3L)), "y" -> ((1L, 1L, 1L))))

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ex = CorpusStats.vocabStats(docs, $"source", "doc_id", $"text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val ap = CorpusStats.vocabStats(docs, $"source", "doc_id", $"text", exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ex.keySet === ap.keySet)
    ex.foreach { case (k, e) =>
      assert(math.abs(ap(k) - e) <= math.max(0.15 * e, 3.0), s"$k: sketch ${ap(k)} vs exact $e")
    }
  }

  test("approx path stays within sketch error of exact on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def grab(exact: Boolean): Map[String, (Double, Double, Double)] =
      CorpusStats.lengthStats(docs, $"source", $"n_chars", exact = exact)
        .collect()
        .map(r => r.getString(0) -> ((r.getDouble(r.fieldIndex("p25")),
          r.getDouble(r.fieldIndex("p50")), r.getDouble(r.fieldIndex("p95")))))
        .toMap
    val (ex, ap) = (grab(true), grab(false))
    assert(ex.keySet === ap.keySet)
    ex.foreach { case (k, (e25, e50, e95)) =>
      val (a25, a50, a95) = ap(k)
      // accuracy 10000 on a few-hundred-row group: the sketch is exact up
      // to interpolation (it returns an actual element, not interpolated)
      assert(math.abs(a25 - e25) <= 0.05 * math.max(e25, 1.0), s"$k p25: $a25 vs $e25")
      assert(math.abs(a50 - e50) <= 0.05 * math.max(e50, 1.0), s"$k p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= 0.05 * math.max(e95, 1.0), s"$k p95: $a95 vs $e95")
    }
  }

  test("vocabOverlap: shared-vocab pairs only, per-source distinct terms") {
    val docs = Seq(
      (1L, "A", "a b"), (2L, "A", "b c"),   // A vocab {a,b,c} (b deduped)
      (3L, "B", "b c d"),                   // B vocab {b,c,d}
      (4L, "C", "x y")                      // C vocab {x,y}, disjoint
    ).toDF("doc_id", "source", "text")
    val out = CorpusStats.vocabOverlap(docs, col("source"), "doc_id", col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // only (A,B) shares terms: {b,c} of union {a,b,c,d} -> 0.5
    assert(out.keySet === Set(("A", "B")))
    assert(out(("A", "B")) === ((3L, 3L, 2L, 0.5)))
  }

  test("datasheet: dup rate from fingerprints, majority lang with tie, exact means") {
    val docs = Seq(
      (1L, "A", "en", "same text here"),
      (2L, "A", "en", "Same   TEXT here"),   // normalizes to the same fp
      (3L, "A", "de", "unique words now"),
      (4L, "B", "de", "eins zwei"),
      (5L, "B", "fr", "un deux")             // B: de/fr tie -> de (lexicographic)
    ).toDF("doc_id", "source", "lang", "text")
    val out = CorpusStats.datasheet(docs, col("source"), "doc_id", col("text"), col("lang"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5), r.getString(7)))).toMap
    // A: 3 docs, 9 tokens, 2 distinct contents -> dup rate 1/3
    assert(out("A") === ((3L, 9L, 2L, 0.333333, "en")))
    assert(out("B") === ((2L, 4L, 2L, 0.0, "de")))
  }

  test("cms: estimates never undercount, and are exact at generous width") {
    val docs = Seq(
      (1L, "a a a b c"), (2L, "a b d"), (3L, "e")).toDF("doc_id", "text")
    val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 1L, "e" -> 1L, "nope" -> 0L)
    val probes = truth.keys.toSeq
    // wide sketch: 5 distinct tokens in 4x1024 cells -> collisions are
    // astronomically unlikely under the fixed hash family; exact equality
    val wide = CorpusStats.cmsEstimate(
        CorpusStats.cmsCells(docs, "doc_id", col("text"), 4, 1024), probes, 4, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide === truth)
    // pathologically narrow sketch (width 2): collisions guaranteed, but
    // the CMS invariant — never undercount — must still hold
    val narrow = CorpusStats.cmsEstimate(
        CorpusStats.cmsCells(docs, "doc_id", col("text"), 2, 2), probes, 2, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, n) =>
      assert(narrow(t) >= n, s"undercount for '$t': ${narrow(t)} < $n")
    }
    // sketch size is depth x width regardless of corpus
    assert(CorpusStats.cmsCells(docs, "doc_id", col("text"), 2, 2).count() <= 4)
  }

  test("cms: shard sketches merge cell-wise into the whole-corpus sketch") {
    val all = Seq((1L, "a a b c"), (2L, "a b d"), (3L, "e e e")).toDF("doc_id", "text")
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      CorpusStats.cmsCells(df, "doc_id", col("text"), 3, 8)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = cellMap(all)
    val s1 = cellMap(all.filter(col("doc_id") <= 1))
    val s2 = cellMap(all.filter(col("doc_id") > 1))
    val merged = (s1.keySet ++ s2.keySet).map(k =>
      k -> (s1.getOrElse(k, 0L) + s2.getOrElse(k, 0L))).toMap
    assert(merged === whole, "sketch of the union must equal cell-wise sum of shard sketches")
  }

  test("oovRate: hand-computed rates, lexical tie-break at the vocab cut, empty doc omitted") {
    // census: a=3 b=3 c=1 -> top-2 by (n desc, tok asc) = {a, b}
    val docs = Seq((1L, "a a b c"), (2L, "b b a"), (3L, "   ")).toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, "doc_id", $"text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 0L, 0.0)), s"got ${got.toSeq}")
    // boundary tie: with vocabSize=1, 'a' wins over 'b' lexically at n=3
    val one = CorpusStats.oovRate(docs, "doc_id", $"text", vocabSize = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(one.toSeq == Seq((1L, 2L), (2L, 2L)), s"got ${one.toSeq}")
  }

  test("vocabCoverage: hand-counted ladder, lexical tie-break, ladder beyond vocab covers all") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(docs, $"text", ladder = Seq(1, 2, 10))
      .orderBy("top_n").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, 3L, 6L, 0.5), (2, 5L, 6L, 0.833333), (10, 6L, 6L, 1.0)), s"got ${got.toSeq}")
    // frequency tie: lexical order decides which type is "top 1"
    val tied = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val t1 = CorpusStats.vocabCoverage(tied, $"text", ladder = Seq(1)).head()
    assert(t1.getLong(1) == 2L && t1.getDouble(3) == 0.4)
  }

  test("ngramDiversity: hand-counted distinct-n per source; repetitive source craters") {
    val docs = Seq(
      (1L, "s1", "a b a b"),  // uni 4/2, bi 3/2 (a b, b a, a b), tri 2/2
      (2L, "s2", "x x x")     // uni 3/1, bi 2/1, tri 1/1
    ).toDF("doc_id", "source", "text")
    val got = CorpusStats.ngramDiversity(docs, $"source", $"text")
      .orderBy("source", "n").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("s1", 1, 4L, 2L, 0.5), ("s1", 2, 3L, 2L, 0.666667), ("s1", 3, 2L, 2L, 1.0),
      ("s2", 1, 3L, 1L, 0.333333), ("s2", 2, 2L, 1L, 0.5), ("s2", 3, 1L, 1L, 1.0)),
      s"got ${got.toSeq}")
    // the repetition tell: s2's distinct-1 is far below s1's
    assert(got.find(t => t._1 == "s2" && t._2 == 1).get._5 <
      got.find(t => t._1 == "s1" && t._2 == 1).get._5)
  }

  test("ngramDiversity approx: HLL distinct within 3*rsd of exact; counts unchanged") {
    // enough distinct grams for the HLL estimate to be meaningful
    val docs = (1L to 50L).map { i =>
      (i, s"s${i % 2}", (1 to 40).map(j => s"w${(i * 37 + j * 11) % 211}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val exact = CorpusStats.ngramDiversity(docs, $"source", $"text")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val rsd = 0.05
    val got = CorpusStats.ngramDiversity(docs, $"source", $"text",
      approx = true, rsd = rsd).collect()
    assert(got.length === exact.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      val (nGrams, nDistinct) = exact(key)
      assert(r.getLong(2) === nGrams, s"$key: n_grams is an exact count either way")
      val rel = math.abs(r.getLong(3) - nDistinct).toDouble / nDistinct
      assert(rel <= 3 * rsd, s"$key: approx distinct ${r.getLong(3)} vs exact " +
        s"$nDistinct — relative error $rel past 3*rsd")
    }
  }

  test("datasheetRollup: levels are additive and consistent with datasheet") {
    // two sources x two langs, one exact dup pair inside (web, en)
    val docs = Seq(
      (1L, "web", "en", "the cat sat"),
      (2L, "web", "en", "the cat sat"),
      (3L, "web", "fr", "le chat noir et blanc"),
      (4L, "books", "en", "a long winter evening"),
      (5L, "books", "de", "der hund")).toDF("doc_id", "source", "lang", "text")
    val out = CorpusStats.datasheetRollup(docs, col("source"), "doc_id",
        col("text"), col("lang"))
      .orderBy("level", "key", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).toSeq
    val leaves = out.filter(_._3 == 0L)
    val perKey = out.filter(_._3 == 1L)
    val total = out.filter(_._3 == 3L)
    assert(out.map(_._3).toSet == Set(0L, 1L, 3L), "rollup levels are 0/1/3")
    assert(leaves.map(t => (t._1, t._2)).toSet ==
      Set(("web", "en"), ("web", "fr"), ("books", "en"), ("books", "de")))
    assert(perKey.forall(_._2 == "<all>") && total == Seq(("<all>", "<all>", 3L, 5L, 17L, 4L)),
      "rolled-up group columns read <all>; total counts 5 docs, 17 tokens, 4 contents")
    // additivity: per-key docs/tokens are the sum of their leaves
    for ((k, n, tok) <- perKey.map(t => (t._1, t._4, t._5))) {
      val mine = leaves.filter(_._1 == k)
      assert(mine.map(_._4).sum == n && mine.map(_._5).sum == tok,
        s"per-key row for $k must sum its leaves")
    }
    // the dup pair is only visible where it lives: (web, en) has 2 docs 1 content
    assert(leaves.find(t => t._1 == "web" && t._2 == "en").get._6 == 1L)
    // per-key rows agree with the single-level datasheet on shared columns
    val single = CorpusStats.datasheet(docs, col("source"), "doc_id",
        col("text"), col("lang"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    assert(perKey.map(t => (t._1, t._4, t._5, t._6)).sortBy(_._1) == single,
      "rollup per-key level must equal datasheet's per-key rows")
  }

  test("clusterDatasheet: population, dominant source, ordered top terms, pinned ties") {
    val docs = Seq(
      (1L, "cat cat dog", "web"),
      (2L, "cat bird", "web"),
      (3L, "dog dog dog fish", "book"),
      (4L, "fish fish dog", "book")
    ).toDF("doc_id", "text", "source")
    val assign = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("id", "cluster")
    val out = CorpusStats.clusterDatasheet(docs, "doc_id", col("text"),
      col("source"), assign, topTerms = 2)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    // cluster 0: 5 tokens, cat tf=3, {dog, bird} tf=1 tie -> bird wins asc
    // cluster 1: 7 tokens, dog tf=4, fish tf=3
    assert(out.toSeq == Seq(
      (0, 2L, 5L, "web", "cat bird"),
      (1, 2L, 7L, "book", "dog fish")), s"got ${out.toSeq}")

    // source tie (1 web vs 1 book in one cluster) resolves ASC -> book
    val tied = CorpusStats.clusterDatasheet(docs.filter(col("doc_id").isin(1L, 3L)),
      "doc_id", col("text"), col("source"),
      Seq((1L, 0), (3L, 0)).toDF("id", "cluster"), topTerms = 1)
      .head()
    assert(tied.getString(3) == "book", "source count tie breaks ascending")
    assert(tied.getString(4) == "dog", "top term by tf: dog 4 beats cat 2")

    intercept[IllegalArgumentException](CorpusStats.clusterDatasheet(
      docs, "doc_id", col("text"), col("source"),
      assign.withColumnRenamed("cluster", "c"), 5))
    intercept[IllegalArgumentException](CorpusStats.clusterDatasheet(
      docs, "doc_id", col("text"), col("source"), assign, 0))
  }

  test("zipfFit: an exact 1/r corpus fits slope -1 with r2 = 1; degenerate source null") {
    // freq * rank = 12 exactly: a x12, b x6, c x4, d x3
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val docs = Seq((1L, "zipf", text), (2L, "mono", "same same same"))
      .toDF("doc_id", "src", "text")
    val out = CorpusStats.zipfFit(docs, col("src"), col("text"), topN = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val (n, slope, r2) = out("zipf")
    assert(n == 4L)
    assert(math.abs(slope.get + 1.0) < 1e-4, s"pure 1/r law fits slope -1: $slope")
    assert(r2.get > 0.9999, s"perfect log-log line: $r2")
    // a one-term source has no line to fit
    val (nm, sm, rm) = out("mono")
    assert(nm == 1L && sm.isEmpty && rm.isEmpty)
    intercept[IllegalArgumentException](
      CorpusStats.zipfFit(docs, col("src"), col("text"), topN = 1))
  }

  test("vocabGrowth: hand-counted prefixes; first occurrence opens the vocab once") {
    val docs = Seq(
      (1L, "a b a"),      // vocab {a,b}, 3 tokens
      (2L, "b c"),        // +c -> 3, 5 tokens
      (3L, "a a a a"),    // nothing new, 9 tokens
      (5L, "d")           // +d -> 4, 10 tokens
    ).toDF("doc_id", "text")
    val out = CorpusStats.vocabGrowth(docs, col("doc_id"), col("text"),
      Seq(1L, 2L, 4L, 10L)).orderBy(col("cutoff")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, 2L),
      (2L, 2L, 5L, 3L),
      (4L, 3L, 9L, 3L),
      (10L, 4L, 10L, 4L)))
    intercept[IllegalArgumentException](
      CorpusStats.vocabGrowth(docs, col("doc_id"), col("text"), Nil))
    intercept[IllegalArgumentException](
      CorpusStats.vocabGrowth(docs, col("doc_id"), col("text"), Seq(1L, 1L)))
  }

  test("zipfFit: the topN cut excludes the tail from the fit") {
    val head = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")).mkString(" ")
    val withTail = Seq((1L, "s", s"$head rare1 rare2 rare3")).toDF("doc_id", "src", "text")
    val headOnly = Seq((1L, "s", head)).toDF("doc_id", "src", "text")
    val cut = CorpusStats.zipfFit(withTail, col("src"), col("text"), topN = 3).head()
    val base = CorpusStats.zipfFit(headOnly, col("src"), col("text"), topN = 3).head()
    assert(cut.getLong(1) == 3L)
    assert(cut.getDouble(2) == base.getDouble(2),
      "tail terms beyond topN must not move the slope")
  }

  test("multiTermsAgg: tuple buckets, null-component skip, sum_other honesty (X285)") {
    val df = Seq(
      (Some("en"), Some("a")), (Some("en"), Some("a")), (Some("en"), Some("a")),
      (Some("en"), Some("b")), (Some("en"), Some("b")),
      (Some("de"), Some("a")),
      (None, Some("a")), (Some("zh"), None)) // missing a component: skipped
      .toDF("lang", "src")
    val got = CorpusStats.multiTermsAgg(df, Seq(col("lang"), col("src")), 2)
      .orderBy(col("doc_count").desc, col("key"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("en|a", 3L), ("en|b", 2L), ("__sum_other__", 1L)),
      "top-2 tuples plus the dropped mass; null-component docs never bucket")
    // no other-mass -> no sentinel row (the X253 convention carries over)
    val all = CorpusStats.multiTermsAgg(df, Seq(col("lang"), col("src")), 10)
      .collect().map(_.getString(0)).toSeq
    assert(!all.contains("__sum_other__"))
    intercept[IllegalArgumentException](
      CorpusStats.multiTermsAgg(df, Seq(col("lang")), 2))
    intercept[IllegalArgumentException](
      CorpusStats.multiTermsAgg(df, Seq(col("lang"), col("src")), 0))
  }

  test("ipv4ToLong: strict reject-don't-guess parse; ipRangeAgg conventions (X298)") {
    val ips = Seq(
      "0.0.0.0" -> Some(0L),
      "255.255.255.255" -> Some(4294967295L),
      "10.0.0.1" -> Some(167772161L),
      "010.0.0.1" -> Some(167772161L), // leading zero is still decimal
      "256.0.0.1" -> None,             // octet > 255
      "1.2.3" -> None,                 // three octets
      "1.2.3.4.5" -> None,             // five octets
      "1.2..4" -> None,                // empty octet
      "a.b.c.d" -> None,               // not decimal
      " 1.2.3.4" -> None,              // whitespace
      "+1.2.3.4" -> None,              // sign
      "1.2.3.1e2" -> None)             // scientific notation
    val got = ips.map(_._1).toDF("ip")
      .select(col("ip"), CorpusStats.ipv4ToLong(col("ip")).as("v"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    ips.foreach { case (s, want) =>
      assert(got(s) === want, s"parse of '$s'") }
    // range agg: overlap, open ends, empty bucket, null drop
    val df = Seq("10.0.0.1", "10.0.0.2", "10.0.1.1", "junk").toDF("ip")
    val agg = CorpusStats.ipRangeAgg(df, col("ip"), Seq(
        (Some("10.0.0.0"), Some("10.0.1.0")),
        (Some("10.0.0.2"), None),
        (None, Some("10.0.0.2")),
        (Some("172.16.0.0"), Some("172.17.0.0"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg("10.0.0.0-10.0.1.0") === 2L)
    assert(agg("10.0.0.2-*") === 2L)
    assert(agg("*-10.0.0.2") === 1L)
    assert(agg("172.16.0.0-172.17.0.0") === 0L, "empty range still emits")
    intercept[IllegalArgumentException](
      CorpusStats.ipRangeAgg(df, col("ip"), Nil))
    intercept[IllegalArgumentException](CorpusStats.ipRangeAgg(df, col("ip"),
      Seq((Some("10.0.1.0"), Some("10.0.0.0")))))
    intercept[IllegalArgumentException](CorpusStats.ipRangeAgg(df, col("ip"),
      Seq((Some("999.0.0.1"), None))))
  }

  test("topMetrics: argmax row per bucket, deterministic tie, null sort skipped (X296)") {
    val df = Seq(
      ("en", Some(10L), "s1", 1L),
      ("en", Some(10L), "s2", 2L),  // tie on sort: highest doc_id wins
      ("en", Some(3L), "s3", 3L),
      ("de", Some(7L), "s4", 4L),
      ("de", None, "s5", 5L))       // null sort: skipped entirely
      .toDF("lang", "chars", "src", "id")
    val got = CorpusStats.topMetrics(df, col("lang"), col("chars"),
        col("id"), Seq("top_chars" -> col("chars"), "top_src" -> col("src")))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq(("de", 1L, 7L, "s4"), ("en", 3L, 10L, "s2")))
    intercept[IllegalArgumentException](
      CorpusStats.topMetrics(df, col("lang"), col("chars"), col("id"), Nil))
    intercept[IllegalArgumentException](
      CorpusStats.topMetrics(df, col("lang"), col("chars"), col("id"),
        Seq("a" -> col("src"), "a" -> col("src"))))
  }

  test("stringStats: length panel + base-2 char entropy; single-char key pins to 0 (X291)") {
    val df = Seq(
      ("a", "abab"),   // chars a:2 b:2 -> entropy 1.0
      ("a", "ab"),     // joined: a:3 b:3 across the key's values
      ("b", "aaaa"),   // single distinct char -> exactly 0.0 (not -0.0)
      ("c", null)      // null string: excluded entirely
    ).toDF("k", "s")
    val got = CorpusStats.stringStats(df, col("k"), col("s"))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      ("a", 2L, 2L, 4L, 3.0, 1.0),
      ("b", 1L, 4L, 4L, 4.0, 0.0)))
    assert(!got.exists(_._1 == "c"), "all-null key emits nothing")
    // entropy of a uniform 4-char alphabet is exactly 2 bits
    val uni = CorpusStats.stringStats(
      Seq(("u", "abcd")).toDF("k", "s"), col("k"), col("s")).head()
    assert(uni.getDouble(5) === 2.0)
  }
}
