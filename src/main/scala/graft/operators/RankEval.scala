package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline ranking evaluation (X222) — the TREC/BEIR-style metrics every
  * search stack needs between "the ranker runs" and "the ranker is
  * good": nDCG@k (Järvelin & Kekäläinen, TOIS'02 graded gain), MRR@k,
  * and recall@k of a RUN (the ranker's per-query ordered hits) against
  * QRELS (graded relevance judgments).
  *
  * Definitions (the trec_eval conventions):
  *   DCG@k   = Σ_{i ≤ k} (2^rel(d_i) − 1) / log2(i + 1), unjudged docs
  *             gain 0 (never an error — runs always retrieve unjudged)
  *   IDCG@k  = DCG of the ideal ordering (rel desc) of the query's own
  *             judgments, cut at k
  *   nDCG@k  = DCG/IDCG; a query with no positive judgment scores 0
  *   RR@k    = 1 / rank of the FIRST rel > 0 hit (0 if none in the top k)
  *   recall@k = |top-k ∩ rel>0| / |rel>0| (0 when the query has no
  *             positive judgment — such rows stay visible via n_rel)
  *
  * Determinism: per-position gains round at 6 and sum as DECIMAL(38,6)
  * (order-free exact addition); log2 is ln(x)/ln 2 with the SAME
  * Scala-printed ln 2 constant the oracle parses. Output doubles round-6.
  *
  * Scale shape: a 10⁶-query eval is two exchanges — run ⟕ qrels on
  * (query_id, doc_id) (both sides pruned to k·|Q| and |judgments|), then
  * one query-keyed aggregate; the ideal-gain leg is a window over the
  * qrels only. No collect, no per-query loop.
  */
object RankEval {

  private val Ln2 = math.log(2.0)

  /** round-6 → DECIMAL(38,6) partial, the order-free-sum discipline. */
  private val dec = DataTypes.createDecimalType(38, 6)

  /** Per-query metrics of `run` (query_id, doc_id, rank — rank 1-based
    * and unique per query, the caller's ranking order) against `qrels`
    * (query_id, doc_id, rel — integer grades ≥ 0, one row per judged
    * pair). Queries present in the RUN are evaluated; a run query with
    * no judgments at all scores 0 across the board with n_rel = 0.
    * Output: (query_id, n_rel, ndcg, rr, recall), round-6. */
  def rankEval(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val gain = (rel: Column) => pow(lit(2.0), rel.cast(DoubleType)) - lit(1.0)
    val log2 = (x: Column) => log(x) / lit(Ln2)
    // run positions ≤ k, judged gain joined on (left: unjudged gain 0)
    val topk = run.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val joined = topk.join(
        qrels.select(col("query_id"), col("doc_id"), col("rel")),
        Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("rel"))
      .withColumn("__g", round(
        gain(col("rel")) / log2(col("rank").cast(DoubleType) + lit(1.0)), 6))
    val perQuery = joined.groupBy(col("query_id")).agg(
      sum(col("__g").cast(dec)).cast(DoubleType).as("dcg"),
      min(when(col("rel") > 0, col("rank"))).as("__first"),
      count(when(col("rel") > 0, 1)).as("__hits"))
    // ideal leg: the query's own judgments, rel desc (doc_id asc tie),
    // cut at k — a window over the QRELS only
    val idealOrd = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val ideal = qrels
      .withColumn("__i", row_number().over(idealOrd))
      .withColumn("__ig", when(col("__i") <= k && col("rel") > 0, round(
        gain(col("rel")) / log2(col("__i").cast(DoubleType) + lit(1.0)), 6))
        .otherwise(lit(0.0)))
      .groupBy(col("query_id")).agg(
        sum(col("__ig").cast(dec)).cast(DoubleType).as("idcg"),
        count(when(col("rel") > 0, 1)).as("n_rel"))
    perQuery.join(ideal, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_rel")).na.fill(0.0, Seq("idcg"))
      .select(
        col("query_id"),
        col("n_rel"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg"),
        round(when(col("__first").isNotNull,
            lit(1.0) / col("__first").cast(DoubleType))
          .otherwise(lit(0.0)), 6).as("rr"),
        round(when(col("n_rel") > 0,
            col("__hits").cast(DoubleType) / col("n_rel").cast(DoubleType))
          .otherwise(lit(0.0)), 6).as("recall"))
  }

  /** The one-row corpus summary over [[rankEval]]'s frame: arithmetic
    * means of ndcg/rr/recall over the evaluated queries (DECIMAL-exact
    * sums, round-6) — the headline numbers a ranker A/B reads. */
  def rankEvalSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      round(sum(col("ndcg").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
        .as("mean_ndcg"),
      round(sum(col("rr").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
        .as("mrr"),
      round(sum(col("recall").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
        .as("mean_recall"))
}
