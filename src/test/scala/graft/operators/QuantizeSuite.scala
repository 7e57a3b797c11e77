package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantizeSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val embs = Seq(
    (1L, Seq(0.0f, -1.0f, 5.0f)),
    (2L, Seq(1.0f, 1.0f, 5.0f)),   // dim 2 is constant
    (3L, Seq(0.5f, 0.0f, 5.0f))
  ).toDF("id", "v").withColumn("v", col("v").cast(ArrayType(FloatType)))

  test("dimStats finds per-dimension extremes") {
    val stats = Quantize.dimStats(embs, "v").orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2)))
    assert(stats.toSeq == Seq((0, 0.0f, 1.0f), (1, -1.0f, 1.0f), (2, 5.0f, 5.0f)))
  }

  test("quantizeInt8 maps min->-128, max->127, midpoints linearly; constant dim -> 0") {
    val q = Quantize.quantizeInt8(embs, "v")
      .select(col("id"), col("qvec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q(1L) == Seq(-128, -128, 0))
    assert(q(2L) == Seq(127, 127, 0))
    // 0.5 of [0,1] -> floor(0.5*255 + 0.5) - 128 = floor(128.0) - 128 = 0
    // 0.0 of [-1,1] -> floor(0.5*255 + 0.5) - 128 = 0
    assert(q(3L) == Seq(0, 0, 0))
  }

  test("dequantize roundtrip error is bounded by half a quantization step") {
    val stats = Quantize.dimStats(embs, "v").orderBy("dim").collect()
      .map(r => (r.getFloat(1).toDouble, r.getFloat(2).toDouble)).toSeq
    val back = Quantize.dequantizeInt8(
      Quantize.quantizeInt8(embs, "v"), "qvec", stats)
    val errs = back.select(
      zip_with(col("v").cast(ArrayType(DoubleType)), col("dqvec").cast(ArrayType(DoubleType)),
        (a, b) => abs(a - b)).as("e"))
      .select(explode(col("e"))).collect().map(_.getDouble(0))
    val maxStep = stats.map { case (mn, mx) => (mx - mn) / 255.0 }.max
    assert(errs.forall(_ <= maxStep / 2 + 1e-9), s"max err ${errs.max} step $maxStep")
  }

  test("sqTopK: exact on grid-aligned vectors, deterministic, score error bounded") {
    import graft.TestSpark
    val spark2 = TestSpark.spark
    // integer coords with per-dim min 0 and max 255 -> the 256-level grid
    // step is exactly 1 -> quantization is lossless -> SQ8 == exact dot
    val d0 = Seq(0f, 255f, 10f, 60f, 90f, 120f, 180f, 220f)
    val d1 = Seq(255f, 0f, 30f, 50f, 80f, 140f, 200f, 240f)
    val grid = (0 until 8).map(i => (i.toLong, Array(d0(i), d1(i))))
    val df = spark2.createDataFrame(grid).toDF("vec_id", "v")
    val q = Array(0.5f, 0.25f)
    val got = Quantize.sqTopK(df, "vec_id", "v", q, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // brute-force oracle on the raw floats
    val want = grid.map { case (id, v) =>
      (id, BigDecimal.valueOf(v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }
        .foldLeft(0.0)(_ + _)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(3)
    assert(got.toSeq === want)
    val again = Quantize.sqTopK(df, "vec_id", "v", q, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === got.toSeq)
  }

  test("clipRecommendation: outlier dim shows small step_ratio; even dim near 1; constant dim 1") {
    // dim0: 99 values in [0,1] + one outlier at 100 -> p99-ish clip
    // discards the outlier, ratio collapses; dim1: uniform 0..99 -> ratio
    // near 1; dim2 constant
    val embs = (0 until 100).map { i =>
      (i.toLong, Array(if (i == 99) 100f else i / 99f, i.toFloat, 5f))
    }.toDF("id", "vec")
    val got = Quantize.clipRecommendation(embs, "vec", loFrac = 0.01, hiFrac = 0.97)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(6)))
    assert(got(0)._2 < 0.05, s"outlier dim ratio ${got(0)._2} should collapse")
    assert(got(1)._2 > 0.9, s"even dim ratio ${got(1)._2} should stay near 1")
    assert(got(2)._2 == 1.0, "constant dim reports 1.0 (nothing to clip)")
  }

  test("clipRecommendation approx: GK bounds land within the rank window of exact") {
    val n = 100
    val embs = (0 until n).map { i =>
      (i.toLong, Array(if (i == 99) 100f else i / 99f, i.toFloat))
    }.toDF("id", "vec")
    val perDim = (0 until 2).map { d =>
      d -> embs.collect().map(_.getSeq[Float](1)(d).toDouble).sorted
    }.toMap
    val (loF, hiF) = (0.05, 0.95)
    val approx = Quantize.clipRecommendation(embs, "vec", loFrac = loF,
      hiFrac = hiF, approx = true, accuracy = 10000)
      .orderBy("dim").collect().map(r => (r.getInt(0), r.getDouble(4), r.getDouble(5)))
    approx.foreach { case (d, lo, hi) =>
      val sorted = perDim(d)
      val err = math.ceil(n.toDouble / 10000).toInt
      def window(p: Double) = {
        val t = (p * (n - 1)).round.toInt
        (sorted(math.max(0, t - err - 1)), sorted(math.min(n - 1, t + err + 1)))
      }
      val (ll, lh) = window(loF)
      // round(_, 6) in the output vs raw sorted values: compare with slack
      assert(lo >= ll - 1e-6 && lo <= lh + 1e-6,
        s"dim $d clip_lo $lo outside rank window [$ll, $lh]")
      val (hl, hh) = window(hiF)
      assert(hi >= hl - 1e-6 && hi <= hh + 1e-6,
        s"dim $d clip_hi $hi outside rank window [$hl, $hh]")
    }
    // the outlier-collapse signal survives the sketch
    val ratios = Quantize.clipRecommendation(embs, "vec", loFrac = 0.01,
      hiFrac = 0.97, approx = true).orderBy("dim").collect().map(_.getDouble(6))
    assert(ratios(0) < 0.05 && ratios(1) > 0.9)
  }

  test("reconstructionError: zero on grid points and constant dims; half-step bound off-grid") {
    val embs = Seq(
      (1L, Array(0f, 7f, 0f)),
      (2L, Array(1f, 7f, 0.5f))).toDF("id", "vec")
    val got = Quantize.reconstructionError(embs, "vec").orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    // dim0 {0,1}: both endpoints reconstruct exactly; dim1 constant -> 0
    assert(got(0) == ((0, 2L, 0.0, 1.0, 0.0, 0.0)), s"${got(0)}")
    assert(got(1) == ((1, 2L, 7.0, 7.0, 0.0, 0.0)), s"${got(1)}")
    // dim2 {0, 0.5}: range 0.5, step 0.5/255; 0 is on-grid, 0.5 maps to
    // code 127 -> dq = 127+128 over 255 of the range: exact endpoint too
    assert(got(2)._1 == 2 && got(2)._2 == 2L && got(2)._3 == 0.0 && got(2)._4 == 0.5)
    // every error bounded by half a step of its dim's grid
    val step2 = 0.5 / 255.0
    assert(got(2)._6 <= step2 / 2 + 1e-12, s"max_ae ${got(2)._6} beyond half-step")
    // an off-grid value: mn=0, mx=1, x=0.3 -> code floor(76.5+0.5)-128=-51
    // -> dq=77/255; hand-checked mae over the three rows
    val embs2 = Seq((1L, Array(0f)), (2L, Array(1f)), (3L, Array(0.3f))).toDF("id", "vec")
    val r = Quantize.reconstructionError(embs2, "vec").head()
    val dq = 77.0 * 1.0 / 255.0
    val exp = math.abs(0.3f.toDouble - dq.toFloat.toDouble)
    def r6(x: Double) = BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r12(x: Double) = BigDecimal.valueOf(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == r6(r12(exp) / 3), s"mae ${r.getDouble(4)} vs ${r6(r12(exp) / 3)}")
    assert(r.getDouble(5) == r6(exp))
  }
}
