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
  * arriving document stream against a FROZEN trigram model.
  *
  * TWO serving shapes, chosen by where the model fits:
  *
  *  - '''Join-served (the 100 TB default)''': [[startJoined]] /
  *    [[scoreJoined]] score each micro-batch with the exact batch
  *    operator [[TextAnalysis.stupidBackoffScore]] against the
  *    persisted [[NgramLm]] tables — distributed joins, NO driver-side
  *    model at all. Tri/bigram tables grow roughly linearly with
  *    reference-corpus tokens (Brants et al., EMNLP '07 — the entire
  *    premise of Stupid Backoff is web-scale counts), so this is the
  *    only shape that survives a web-scale reference. The version is
  *    pinned once at stream start (zero train/serve skew); per-batch
  *    aggregation is exact because a document is one input row.
  *  - '''Broadcast-served''': [[buildModel]] / [[loadModel]] collect
  *    the count tables into an [[SbModel]] broadcast once, scoring as
  *    a stateless per-row map — the lowest-latency shape WHEN the
  *    model fits on the driver. `minCount` floors the collected
  *    tables with defined semantics (below) for reference corpora
  *    whose full tables do not fit.
  *
  * `minCount` contract: all three lookup tables floor UNIFORMLY
  * (c ≥ minCount survives), so every branch's denominator stays
  * present whenever its numerator does (c2(w1,w2) ≥ c3(w1,w2,w3);
  * c1(w2) ≥ c2(w2,w3)); N and V stay the EXACT corpus totals,
  * aggregated before the floor, so the unseen-word branch is
  * unchanged. A pruned n-gram simply behaves as unseen in its lookup
  * role — the score takes the backoff branch it would take for a
  * never-seen n-gram (suite-pinned differential: docs whose n-grams
  * all survive the floor score bit-identically to the unfloored
  * model).
  *
  * Parity with the batch operator is exact and suite-pinned:
  * [[scoreJoined]] IS the batch code path; [[score]]'s tokenization is
  * [[LmStream.tokensOf]] (the engine `tokens` mirror), trigrams keep
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
      lambda: Double, minCount: Int): SbModel = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    // N and V are the unseen-word branch's denominators: exact corpus
    // totals, aggregated BEFORE the floor prunes the lookup tables
    val nv = uni.agg(sum(col("c1")).as("__n"), count(lit(1)).as("__v")).head()
    val (n, v) =
      if (nv.isNullAt(0)) (0L, 0L) else (nv.getLong(0), nv.getLong(1))
    def floored(df: DataFrame, c: String) =
      if (minCount == 1) df else df.filter(col(c) >= minCount)
    val c3 = floored(tri, "c3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val c2 = floored(bi, "c2").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val c1 = floored(uni, "c1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    SbModel(c3, c2, c1, n, v, lambda)
  }

  /** Count the model from a reference corpus; `minCount` floors the
    * lookup tables (see the object scaladoc for the exact pruned-branch
    * semantics — N/V stay exact). */
  def buildModel(refDocs: DataFrame, idCol: String, text: Column,
      lambda: Double = 0.4, minCount: Int = 1): SbModel =
    modelFrom(
      TextAnalysis.trigramTriples(refDocs, idCol, text)
        .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c3")),
      TextAnalysis.bigramPairs(refDocs, idCol, text)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")),
      TextAnalysis.positionalPostings(refDocs, idCol, text)
        .groupBy(col("term")).agg(count(lit(1)).as("c1")),
      lambda, minCount)

  /** Freeze the CURRENT version of a persisted [[NgramLm]] artifact —
    * count once batch-side, serve from any stream. Same `minCount`
    * contract as [[buildModel]]. */
  def loadModel(spark: SparkSession, lmPath: String,
      lambda: Double = 0.4, minCount: Int = 1): SbModel = {
    val lm = new NgramLm(spark, lmPath)
    val v = lm.currentVersion()
    modelFrom(
      spark.read.parquet(s"$lmPath/v=$v/tri").select("w1", "w2", "w3", "c3"),
      spark.read.parquet(s"$lmPath/v=$v/bi").select("w1", "w2", "c2"),
      spark.read.parquet(s"$lmPath/v=$v/uni").select("term", "c1"),
      lambda, minCount)
  }

  /** A frozen, version-pinned set of [[NgramLm]] count FRAMES for the
    * join-served path — no driver materialization. `bi` and `uni` have
    * two-plus join consumers per scoring call, so they pin once here
    * (executor-side, amortized over every micro-batch — the X154
    * discipline); `tri` has one consumer and re-reads its parquet. */
  final case class SbTables private[SbStream] (tri: DataFrame, bi: DataFrame,
      uni: DataFrame, lambda: Double)

  /** Pin the CURRENT version of a persisted [[NgramLm]] for join-served
    * scoring. The version is frozen at this call — later [[NgramLm
    * .append]]s publish new version directories and never touch this
    * one, so every micro-batch of a stream scores against the same
    * model (zero skew; vacuum only after the stream stops). */
  def freezeTables(spark: SparkSession, lmPath: String,
      lambda: Double = 0.4, pin: Boolean = true): SbTables = {
    require(lambda > 0.0 && lambda < 1.0, s"lambda must be in (0,1), got $lambda")
    val lm = new NgramLm(spark, lmPath)
    val v = lm.currentVersion()
    // pin = executor-side storage for the multi-consumer tables,
    // amortized over every micro-batch; pass pin = false to trade that
    // memory for a parquet re-scan per consumer per batch when the bi
    // table outgrows cluster storage (the version dir is immutable, so
    // both shapes read identical data)
    def maybePin(df: DataFrame) = if (pin) df.localCheckpoint(true) else df
    SbTables(
      spark.read.parquet(s"$lmPath/v=$v/tri").select("w1", "w2", "w3", "c3"),
      maybePin(spark.read.parquet(s"$lmPath/v=$v/bi").select("w1", "w2", "c2")),
      maybePin(spark.read.parquet(s"$lmPath/v=$v/uni").select("term", "c1")),
      lambda)
  }

  /** Score a batch (one micro-batch, or any DataFrame) against frozen
    * count tables — the EXACT batch operator
    * [[TextAnalysis.stupidBackoffScore]], so the join-served stream
    * cannot drift from the backfill by construction. Output:
    * (idCol, n_trigrams, xent, ppl). */
  def scoreJoined(docs: DataFrame, idCol: String, text: Column,
      t: SbTables): DataFrame =
    TextAnalysis.stupidBackoffScore(docs, idCol, text, t.tri, t.bi, t.uni,
      t.lambda)

  /** Stream document parquet files from `docsDir`, score each
    * micro-batch against the pinned [[NgramLm]] version with
    * distributed stream-static joins (NO driver-side count table), and
    * append the scores to `outDir`. Exactly-once ON DOC IDS via the
    * [[IndexIngest]] replay-guard shape: arriving ids probe the
    * already-scored output (broadcast semi-join — the corpus-sized side
    * never shuffles) and already-scored docs drop before scoring. */
  def startJoined(
      spark: SparkSession,
      docsDir: String,
      checkpointDir: String,
      outDir: String,
      lmPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      lambda: Double = 0.4,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      maxStaleVersions: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // restart path = the version-GC point (X186 on NgramLm): this
    // stream is about to re-pin to CURRENT, so superseded versions
    // beyond the retention threshold are reclaimable — run the policy
    // BEFORE freezing, a version pinned below can never be vacuumed
    // out from under the stream (vacuum keeps current)
    new NgramLm(spark, lmPath).maintain(maxStaleVersions)
    val tables = freezeTables(spark, lmPath, lambda)
    spark.readStream
      .schema(schema.getOrElse(spark.read.parquet(docsDir).schema))
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fresh = freshIds(spark, outDir, batch, idCol)
        if (!fresh.isEmpty)
          scoreJoined(fresh, idCol, col(textCol), tables)
            .write.mode("append").parquet(outDir)
      }
      .start()
  }

  /** Batch rows whose id has not been scored yet — the [[IndexIngest
    * .freshOnly]] plan shape against the output directory. */
  private def freshIds(spark: SparkSession, outDir: String,
      batch: DataFrame, idCol: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deduped = batch.dropDuplicates(idCol)
    if (!fs.exists(new org.apache.hadoop.fs.Path(outDir))) deduped
    else {
      val ids = batch.select(col(idCol)).distinct()
      val done = spark.read.parquet(outDir).select(col(idCol))
        .join(broadcast(ids), Seq(idCol), "left_semi")
      deduped.join(broadcast(done), Seq(idCol), "left_anti")
    }
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
