package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.NgramLm

/** Per-document Stupid Backoff score for streaming ingest. */
final case class SbDocScore(doc_id: Long, n_trigrams: Long, xent: Double,
  ppl: Double)

/** Streaming counterpart of [[TextAnalysis.stupidBackoff]] (X154) — and
  * the serve side of the persisted [[NgramLm]] artifact (X167): score an
  * arriving document stream against a FROZEN trigram model, the same
  * production shape as [[LmStream]] (frozen model broadcast once,
  * stateless per-row scoring, Append-mode safe, no watermark, no
  * shuffle, zero train/serve skew against the backfill).
  *
  * Two ways to freeze a model: [[buildModel]] counts a reference corpus
  * directly; [[loadModel]] reads an [[NgramLm]] artifact's CURRENT
  * version — count once batch-side, serve everywhere. Either way the
  * collect is the vocabulary-sized tables only, never the corpus; cap
  * upstream (frequency floor) if the vocabulary outgrows driver memory
  * (the [[LmStream.buildModel]] caveat).
  *
  * Parity with the batch operator is exact and suite-pinned: tokenization
  * is [[LmStream.tokensOf]] (the engine `tokens` mirror), trigrams keep
  * the all-three-non-empty slot rule, the branch arithmetic and the
  * round-6 half-up discipline are [[TextAnalysis.stupidBackoffScore]]'s
  * op-for-op. */
object SbStream {

  /** Frozen Stupid Backoff model: tri/bi/uni counts + token total N and
    * vocabulary size V. */
  final case class SbModel(c3: Map[(String, String, String), Long],
      c2: Map[(String, String), Long], c1: Map[String, Long],
      n: Long, v: Long, lambda: Double) {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    require(v > 0, "reference corpus has no tokens")
  }

  private def modelFrom(tri: DataFrame, bi: DataFrame, uni: DataFrame,
      lambda: Double): SbModel = {
    val c3 = tri.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val c2 = bi.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SbModel(c3, c2, c1, c1.values.sum, c1.size.toLong, lambda)
  }

  /** Count the model from a reference corpus. */
  def buildModel(refDocs: DataFrame, idCol: String, text: Column,
      lambda: Double = 0.4): SbModel =
    modelFrom(
      TextAnalysis.trigramTriples(refDocs, idCol, text)
        .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3")),
      TextAnalysis.bigramPairs(refDocs, idCol, text)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")),
      TextAnalysis.positionalPostings(refDocs, idCol, text)
        .groupBy(col("term")).agg(count(lit(1)).as("c1")),
      lambda)

  /** Freeze the CURRENT version of a persisted [[NgramLm]] artifact —
    * count once batch-side, serve from any stream. */
  def loadModel(spark: SparkSession, lmPath: String,
      lambda: Double = 0.4): SbModel = {
    val lm = new NgramLm(spark, lmPath)
    val v = lm.currentVersion()
    modelFrom(
      spark.read.parquet(s"$lmPath/v=$v/tri").select("w1", "w2", "w3", "c3"),
      spark.read.parquet(s"$lmPath/v=$v/bi").select("w1", "w2", "c2"),
      spark.read.parquet(s"$lmPath/v=$v/uni").select("term", "c1"),
      lambda)
  }

  private def r6(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)

  /** Score one document; None when it has no trigrams (matching the
    * batch operator's omission of sub-3-token docs). */
  def scoreDoc(text: String, m: SbModel): Option[(Long, Double, Double)] = {
    val toks = LmStream.tokensOf(text)
    val lam = m.lambda
    val lps = (0 until toks.length - 2).iterator
      .map(i => (toks(i), toks(i + 1), toks(i + 2)))
      .filter { case (a, b, c) => a.nonEmpty && b.nonEmpty && c.nonEmpty }
      .map { case (w1, w2, w3) =>
        val c3 = m.c3.getOrElse((w1, w2, w3), 0L)
        val s =
          if (c3 > 0) c3.toDouble / m.c2((w1, w2)).toDouble
          else {
            val c2b = m.c2.getOrElse((w2, w3), 0L)
            if (c2b > 0) lam * (c2b.toDouble / m.c1(w2).toDouble)
            else (lam * lam) *
              ((m.c1.getOrElse(w3, 0L).toDouble + 1.0) / (m.n.toDouble + m.v.toDouble))
          }
        r6(-math.log(s))
      }
      .toSeq
    if (lps.isEmpty) None
    else {
      val sum = lps.reduce(_.add(_))
      val xent = r6(sum.doubleValue() / lps.size).doubleValue()
      val ppl = r6(math.exp(xent)).doubleValue()
      Some((lps.size.toLong, xent, ppl))
    }
  }

  /** Score a (doc_id, text) stream (or batch Dataset — same code path)
    * against the frozen model. Stateless flatMap: Append-mode safe,
    * watermark-free, shuffle-free. */
  def score(docs: Dataset[(Long, String)], model: SbModel): Dataset[SbDocScore] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc: Broadcast[SbModel] = spark.sparkContext.broadcast(model)
    docs.flatMap { case (id, text) =>
      scoreDoc(text, bc.value).map { case (n, xent, ppl) =>
        SbDocScore(id, n, xent, ppl) }
    }
  }
}
