package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar (per-dimension min/max) int8 quantization of an embedding
  * column — the storage-side operator a 100 TB vector corpus needs: a
  * float32 dim becomes one byte (4x smaller scans, SIMD-friendly distance
  * kernels downstream).
  *
  * Two passes, both scale-flat:
  *  1. [[dimStats]]: posexplode -> per-dim min/max. Map-side combine
  *     collapses every task to `dim` rows before the shuffle, so the
  *     exchange moves O(tasks * dim) rows regardless of corpus size.
  *  2. [[quantizeInt8]]: the dim-sized stats table (pure metadata) is
  *     collected and inlined as literal arrays, making the quantization a
  *     shuffle-free per-row map over the corpus.
  *
  * All arithmetic is single-step IEEE double ops (sub, mul, div, floor) —
  * bit-identical in any engine, so the oracle check is exact.
  */
object Quantize {

  /** Per-dimension (dim, mn, mx) over the corpus. min/max pick existing
    * float values — no accumulation, no ordering sensitivity. */
  def dimStats(embs: DataFrame, vecCol: String): DataFrame =
    embs
      .select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("dim"))
      .agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))

  /** Quantize to int8: `q = floor((x - mn) * 255 / (mx - mn) + 0.5) - 128`,
    * clamped to [-128, 127]; a constant dimension (mx == mn) maps to 0.
    * `floor(v + 0.5)` rather than `round(v)` — half-even vs half-up
    * disagreements between engines cannot arise (and an exact .5 input to
    * floor is unambiguous). Returns the input frame plus `<out>` =
    * array<int> in dimension order. */
  def quantizeInt8(embs: DataFrame, vecCol: String, out: String = "qvec"): DataFrame =
    quantizeInt8(embs, vecCol, out, collectStats(embs, vecCol))

  /** The dim-sized (mn, mx) table as driver metadata, dimension order. */
  def collectStats(embs: DataFrame, vecCol: String): Seq[(Double, Double)] =
    dimStats(embs, vecCol).orderBy(col("dim"))
      .collect().map(r => (r.getFloat(1).toDouble, r.getFloat(2).toDouble)).toSeq

  /** [[quantizeInt8]] against pre-collected stats — ONE stats job shared
    * by quantize and search when both run in a session. */
  def quantizeInt8(embs: DataFrame, vecCol: String, out: String,
      stats: Seq[(Double, Double)]): DataFrame = {
    val mns = array(stats.map(s => lit(s._1)).toIndexedSeq: _*)
    val rngs = array(stats.map(s => lit(s._2 - s._1)).toIndexedSeq: _*)
    embs.withColumn(out,
      transform(col(vecCol), (x, i) => {
        val mn = element_at(mns, i + 1)
        val rng = element_at(rngs, i + 1)
        // never divide by zero, even in the branch not taken: floor(inf)
        // misbehaves under ANSI and when() does not short-circuit per-lane
        val safeRng = when(rng === 0.0, lit(1.0)).otherwise(rng)
        val q = floor((x.cast(DoubleType) - mn) * lit(255.0) / safeRng + lit(0.5)) - lit(128L)
        when(rng === 0.0, lit(0))
          .otherwise(greatest(lit(-128L), least(lit(127L), q)).cast(IntegerType))
      }))
  }

  /** Dequantize back to approximate floats (the read-path inverse):
    * `x ~ mn + (q + 128) * (mx - mn) / 255`. */
  def dequantizeInt8(df: DataFrame, qCol: String, stats: Seq[(Double, Double)],
      out: String = "dqvec"): DataFrame = {
    val mns = array(stats.map(s => lit(s._1)).toIndexedSeq: _*)
    val rngs = array(stats.map(s => lit(s._2 - s._1)).toIndexedSeq: _*)
    df.withColumn(out,
      transform(col(qCol), (q, i) =>
        (element_at(mns, i + 1) +
          (q.cast(DoubleType) + lit(128.0)) * element_at(rngs, i + 1) / lit(255.0))
          .cast(FloatType)))
  }

  /** Per-dimension reconstruction-error report (X94): mean and max
    * absolute error between the original floats and their
    * quantize→dequantize round trip, next to the (mn, mx) range that
    * determined the grid — the accuracy gate a pipeline runs BEFORE
    * switching its stored index to int8 codes. A healthy dim shows
    * mae ≈ range/(2·255); an outlier-stretched range inflates it (the
    * signal to clip or switch that dim to a trained quantizer); max_ae
    * bounds the worst single reconstruction.
    *
    * Determinism: the round trip is the exact [[quantizeInt8]]/
    * [[dequantizeInt8]] IEEE arithmetic; per-element errors round to the
    * 12-decimal grid and accumulate in exact decimal (the round-6 output
    * discipline), max is order-insensitive. Scale shape: one stats job
    * (dim-sized metadata) + one corpus pass; the per-dim aggregation
    * map-side combines to ≤ dim rows per task before its exchange —
    * vectors never shuffle. */
  def reconstructionError(embs: DataFrame, vecCol: String): DataFrame = {
    val stats = collectStats(embs, vecCol)
    val dec = DataTypes.createDecimalType(38, 12)
    val mns = array(stats.map(s => lit(s._1)).toIndexedSeq: _*)
    val mxs = array(stats.map(s => lit(s._2)).toIndexedSeq: _*)
    val coded = dequantizeInt8(
      quantizeInt8(embs, vecCol, "__q", stats), "__q", stats, "__dq")
    coded
      .select(posexplode(transform(col(vecCol), (x, i) =>
        abs(x.cast(DoubleType) - element_at(col("__dq"), i + 1).cast(DoubleType))))
        .as(Seq("dim", "__e")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("__e"), 12).cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("mae"),
        round(max(col("__e")), 6).as("max_ae"))
      .select(col("dim"), col("n"),
        round(element_at(mns, col("dim") + 1), 6).as("mn"),
        round(element_at(mxs, col("dim") + 1), 6).as("mx"),
        col("mae"), col("max_ae"))
  }

  /** Clip recommendation (X104): per-dimension percentile bounds
    * [loFrac, hiFrac] next to the raw (mn, mx), and the grid-step ratio
    * a clipped quantizer would achieve — the standard fix when
    * [[reconstructionError]] shows an outlier-stretched range: clipping
    * 0.1% of the tails shrinks the int8 step by `step_ratio`, improving
    * everyone else's reconstruction at the cost of saturating the
    * clipped tail (FAISS's RangeStat_Quantiles policy). step_ratio near
    * 1 = the range is honest, don't clip; near 0 = a few outliers own
    * the grid.
    *
    * Exact `percentile` by default (linear interpolation — identical to
    * DuckDB's quantile_cont, oracle-checkable); at 100 TB pass
    * `approx = true`: `percentile_approx` (GK sketch, rank error <=
    * n/accuracy per dimension) — the [[CorpusStats.lengthStats]]
    * exact/sketch duality, same one dim-keyed exchange with the sort
    * state collapsed to a bounded sketch. The suite pins the approx
    * bounds within the observed-rank tolerance of exact. */
  def clipRecommendation(embs: DataFrame, vecCol: String,
      loFrac: Double = 0.001, hiFrac: Double = 0.999,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(loFrac >= 0.0 && hiFrac <= 1.0 && loFrac < hiFrac,
      s"need 0 <= loFrac < hiFrac <= 1, got ($loFrac, $hiFrac)")
    def pct(c: Column, f: Double): Column =
      if (approx) percentile_approx(c, lit(f), lit(accuracy))
      else percentile(c, lit(f))
    embs.select(posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .withColumn("__x", col("__x").cast(DoubleType))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        min(col("__x")).as("__mn"), max(col("__x")).as("__mx"),
        pct(col("__x"), loFrac).as("__lo"),
        pct(col("__x"), hiFrac).as("__hi"))
      .select(col("dim"), col("n"),
        round(col("__mn"), 6).as("mn"), round(col("__mx"), 6).as("mx"),
        round(col("__lo"), 6).as("clip_lo"), round(col("__hi"), 6).as("clip_hi"),
        round(when(col("__mx") === col("__mn"), 1.0)
          .otherwise((col("__hi") - col("__lo")) / (col("__mx") - col("__mn"))), 6)
          .as("step_ratio"))
  }

  /** SQ8 asymmetric top-k (FAISS's ScalarQuantizer search shape): the
    * float query scores against DEQUANTIZED int8 codes — the store holds
    * 1 byte/dim, accuracy follows the quantization grid, and the scan
    * reads a quarter of the float32 bytes. Scoring is the engine's
    * bit-exact sequential dot ([[graft.functions.VectorFunctions.vecDot]])
    * over the reconstructed floats, so the oracle reproduces scores
    * exactly; top-k is the distributed TakeOrderedAndProject heap.
    *
    * Pass a pre-quantized frame via `coded` (with `stats` from the same
    * session) to skip re-encoding — the production path, where codes are
    * the stored representation. */
  def sqTopK(embs: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame = {
    val stats = collectStats(embs, vecCol)
    sqTopKCoded(quantizeInt8(embs, vecCol, "qvec", stats), idCol, "qvec",
      stats, query, k)
  }

  /** [[sqTopK]] over an already-encoded frame. */
  def sqTopKCoded(coded: DataFrame, idCol: String, qCol: String,
      stats: Seq[(Double, Double)], query: Array[Float], k: Int): DataFrame = {
    import graft.functions.VectorFunctions.vecDot
    require(k > 0, s"k must be positive, got $k")
    val q = lit(query).cast(ArrayType(FloatType))
    dequantizeInt8(coded, qCol, stats)
      .withColumn("__score", vecDot(col("dqvec"), q))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("__score"), 6).as("score"))
  }
}
