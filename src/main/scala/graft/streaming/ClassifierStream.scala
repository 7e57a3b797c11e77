package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Streaming counterpart of [[graft.operators.Curation.qualityClassifier]]
  * (X158): gate an arriving document stream with a FROZEN hashed-feature
  * logistic-regression model trained by a batch job — the "filter the
  * crawl as it lands" production shape (the GPT-3/CCNet quality filter at
  * ingest), with ZERO train/serve skew: the streaming score IS the batch
  * scoring expression — the same [[Curation.featureMask]] bit-OR fold and
  * the same [[Curation.lrProb]] left-assoc logit chain, weights inlined
  * as literals. That makes scoring a pure per-row projection: Append-mode
  * safe, watermark-free, stateless, shuffle-free — no broadcast, no
  * stream-static join, nothing for a checkpoint to carry.
  *
  * Retraining is a batch concern ([[trainModel]] on the accumulated
  * corpus); swap the model by restarting the query — the standard
  * frozen-model serving loop, same as [[LmStream]]. */
object ClassifierStream {

  /** Frozen LR model: one weight per hashed feature bit, plus bias.
    * `weights.size` IS the feature width — the mask hash must use the
    * same dims at train and serve time, which holding them in one value
    * makes structural. */
  final case class Model(weights: Seq[Double], bias: Double) {
    require(weights.nonEmpty && weights.size <= 60,
      s"weights size must be in [1,60] (bitmask in one Long), got ${weights.size}")
  }

  /** Train on a batch corpus ([[Curation.lrTrain]] — the exact
    * oracle-replayed training run) and freeze the result. */
  def trainModel(docs: DataFrame, text: Column, label: Column,
      dims: Int, iters: Int, lr: Double): Model = {
    val (w, b) = Curation.lrTrain(docs, text, label, dims, iters, lr)
    Model(w, b)
  }

  /** The round-6 probability column for `text` under `m` — exposed so
    * gate/score/suites all share ONE expression (bit-parity by
    * construction). */
  def probOf(text: Column, m: Model): Column =
    round(Curation.lrProb(
      Curation.featureMask(text, m.weights.size), m.weights, m.bias), 6)

  /** Score a streaming (or batch — same code path) frame:
    * (id, prob, pred), pred on the ROUNDED prob like the batch operator. */
  def score(docs: DataFrame, idCol: String, text: Column, m: Model): DataFrame = {
    val prob = probOf(text, m)
    docs.select(col(idCol), prob.as("prob"), (prob >= lit(0.5)).as("pred"))
  }

  /** Keep only rows scoring at/above `threshold` (on the rounded prob —
    * the pinned tie surface). Rows pass through UNPROJECTED, so the gate
    * drops into any ingest chain ([[IngestDedup]] → gate →
    * [[EmbedPipeline]]) without schema surgery. */
  def gate(docs: DataFrame, text: Column, m: Model,
      threshold: Double = 0.5): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0,
      s"threshold must be in [0,1], got $threshold")
    docs.filter(probOf(text, m) >= lit(threshold))
  }
}
