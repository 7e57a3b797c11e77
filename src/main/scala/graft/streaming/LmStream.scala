package graft.streaming

import java.util.Locale

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Per-document LM score for [[graft.streaming]] ingest pipelines. */
final case class LmDocScore(doc_id: Long, n_bigrams: Long, xent: Double, ppl: Double)

/** Streaming counterpart of [[TextAnalysis.lmScore]] (X64): score an
  * arriving document stream against a FROZEN bigram model built by a batch
  * job — the production "score the crawl as it lands" shape (CCNet quality
  * bucketing at ingest, with zero train/serve skew against the backfill).
  *
  * Design: the model is vocabulary-sized (metadata next to the corpus), so
  * it rides to every executor once as a broadcast; scoring is then a
  * STATELESS per-row map — each document carries all of its own bigrams —
  * which keeps the stream in Append mode with no watermark, no stateful
  * aggregation, and no shuffle. A stream-static join would force a
  * per-bigram explode plus an update-mode groupBy; per-row lookup against
  * the broadcast does the same arithmetic with none of that state.
  *
  * Parity with the batch operator is exact and pinned by
  * StreamingLmSuite: tokenization mirrors [[TextAnalysis.tokens]]
  * (space-only trim like Spark's `trim`, Locale.ROOT lowercase, the
  * [[TextAnalysis.Ws]] whitespace class with limit -1 split), pairs with
  * empty members drop AFTER adjacency (an empty token still breaks
  * adjacency), and the rounding discipline is bit-identical (per-bigram
  * half-up round at 6, exact decimal sum, one double division). */
object LmStream {

  /** Frozen add-alpha bigram model: continuation counts, head totals,
    * distinct-continuation vocabulary size. */
  final case class LmModel(c2: Map[(String, String), Long], c1: Map[String, Long],
      v: Long, alpha: Double) {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(v > 0, "reference corpus has no bigrams")
  }

  /** Count the model from a reference corpus. `minCount` floors the
    * collected BIGRAM table (the table that scales with corpus tokens)
    * for reference corpora whose full table outgrows driver memory;
    * heads (`c1` — every bigram's denominator) and V are EXACT, derived
    * by aggregation before the floor, so a pruned bigram scores exactly
    * as an unseen one: P = alpha / (c1(w1) + alpha·V) — defined backoff
    * semantics, suite-pinned differentially. The truly unbounded shape
    * is [[scoreJoined]], which never collects a table at all. */
  def buildModel(refDocs: DataFrame, idCol: String, text: Column,
      alpha: Double = 0.5, minCount: Int = 1): LmModel = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // three consumers (c2 collect, head aggregate, V aggregate) — pin
    // once, the [[TextAnalysis.lmScore]] discipline
    val bg = TextAnalysis.bigramPairs(refDocs, idCol, text)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val c1 = bg.groupBy(col("w1")).agg(sum(col("c2")).cast("long").as("c1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v = bg.agg(count_distinct(col("w2"))).head().getLong(0)
    val floored = if (minCount == 1) bg else bg.filter(col("c2") >= minCount)
    val c2 = floored.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.util.Pins.release(bg)
    LmModel(c2, c1, v, alpha)
  }

  /** Pin the CURRENT bigram count table of a persisted
    * [[graft.sources.NgramLm]] artifact for join-served scoring — the
    * (w1, w2, c2) frame IS the [[TextAnalysis.lmScore]] model. No
    * driver materialization; the version is frozen at this call. */
  def freezeCounts(spark: org.apache.spark.sql.SparkSession,
      lmPath: String): DataFrame = {
    val lm = new graft.sources.NgramLm(spark, lmPath)
    val v = lm.currentVersion()
    spark.read.parquet(s"$lmPath/v=$v/bi").select("w1", "w2", "c2")
      .localCheckpoint(true)
  }

  /** Score a batch (one micro-batch, or any DataFrame) against a frozen
    * bigram count table — the EXACT batch operator
    * ([[TextAnalysis.lmScore]]'s scoring half), distributed joins, no
    * driver-side model. `bg` must be pinned (one [[freezeCounts]] per
    * stream, not per batch). Output: (idCol, n_bigrams, xent, ppl). */
  def scoreJoined(docs: DataFrame, idCol: String, text: Column,
      bg: DataFrame, alpha: Double = 0.5): DataFrame =
    TextAnalysis.lmScoreCounted(docs, idCol, text, bg, alpha)

  /** Mirror of `split(lower(trim(text)), "[Ws]+", -1)`: Spark's trim
    * strips 0x20 only (NOT Java's String.trim, which eats all controls). */
  private[streaming] def tokensOf(text: String): Array[String] = {
    var from = 0
    var to = text.length
    while (from < to && text.charAt(from) == ' ') from += 1
    while (to > from && text.charAt(to - 1) == ' ') to -= 1
    text.substring(from, to).toLowerCase(Locale.ROOT)
      .split(s"[${TextAnalysis.Ws}]+", -1)
  }

  /** Score one document; None when it has no bigrams (matching the batch
    * operator's omission of sub-2-token docs). */
  def scoreDoc(text: String, m: LmModel): Option[(Long, Double, Double)] = {
    val toks = tokensOf(text)
    val lps = (0 until toks.length - 1).iterator
      .map(i => (toks(i), toks(i + 1)))
      .filter { case (w1, w2) => w1.nonEmpty && w2.nonEmpty }
      .map { case (w1, w2) =>
        val p = (m.c2.getOrElse((w1, w2), 0L).toDouble + m.alpha) /
          (m.c1.getOrElse(w1, 0L).toDouble + m.alpha * m.v.toDouble)
        BigDecimal.valueOf(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      .toSeq
    if (lps.isEmpty) None
    else {
      val xent = BigDecimal.valueOf(lps.sum.toDouble / lps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ppl = BigDecimal.valueOf(math.exp(xent))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Some((lps.size.toLong, xent, ppl))
    }
  }

  /** Score a (doc_id, text) stream (or batch Dataset — same code path)
    * against the frozen model. Stateless flatMap: Append-mode safe,
    * watermark-free, shuffle-free. */
  def score(docs: Dataset[(Long, String)], model: LmModel): Dataset[LmDocScore] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc: Broadcast[LmModel] = spark.sparkContext.broadcast(model)
    docs.flatMap { case (id, text) =>
      scoreDoc(text, bc.value).map { case (n, xent, ppl) => LmDocScore(id, n, xent, ppl) }
    }
  }
}
