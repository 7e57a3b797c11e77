package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group distribution statistics over a corpus — the length/size
  * profiling every curation run starts with (how long are the documents
  * per source? where does the p95 sit before I pick a truncation
  * budget?).
  *
  * Two paths, same output shape:
  *  - `exact = true`: `percentile` — a full sort-based exact quantile.
  *    Linear-interpolation semantics identical to DuckDB's
  *    `quantile_cont`, so the result is oracle-checkable bit-for-bit.
  *    Costs a per-group sort; fine up to millions of rows per group.
  *  - `exact = false`: `approx_percentile` (Greenwald–Khanna sketch) —
  *    the 100 TB path: one streaming pass, mergeable partial sketches,
  *    bounded memory per group, rank error ≤ 1/accuracy. Not
  *    oracle-comparable (sketch outputs are engine-specific); the unit
  *    suite bounds its error against the exact path instead.
  */
object CorpusStats {

  /** Per-key vocabulary profile: document count, token total, and
    * distinct-term cardinality. `exact = true` pays the full
    * (key, term)-distinct shuffle — oracle-checkable; `exact = false`
    * swaps in `approx_count_distinct` (HyperLogLog++), the 100 TB path:
    * fixed-size mergeable sketches per partition instead of shuffling
    * the distinct pairs, at rsd relative error (default 5%). Same output
    * schema either way; the unit suite bounds the sketch against the
    * exact path. */
  def vocabStats(docs: DataFrame, key: Column, idCol: String, text: Column,
      exact: Boolean = true, rsd: Double = 0.05): DataFrame =
    TextAnalysis.postings(docs, idCol, text, extraCols = Seq("key" -> key))
      .groupBy(col("key"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        (if (exact) countDistinct(col("term"))
         else approx_count_distinct(col("term"), rsd)).as("n_terms"))

  /** Pairwise vocabulary overlap between corpus keys (sources, languages,
    * shards): Jaccard of the DISTINCT term sets per key pair — the
    * source-similarity diagnostic behind mixture design (two crawls with
    * 0.9 vocab Jaccard are near-redundant; a source with no overlap is
    * either gold or garbage) and drift checks between corpus snapshots.
    *
    * Emits `(s1, s2, v1, v2, n_shared, jaccard)` for every key pair that
    * shares at least one term, s1 < s2.
    *
    * Scale shape: reduces to (key, term)-distinct postings; the pair
    * counts come from a term-keyed self-join — the per-term cost is
    * (#keys containing the term choose 2), bounded by the KEY count
    * (sources/languages number in the thousands), never the corpus size.
    * The vocab-size table is one row per key and broadcasts onto the
    * result. */
  def vocabOverlap(docs: DataFrame, key: Column, idCol: String,
      text: Column): DataFrame = {
    val posts = TextAnalysis.postings(docs, idCol, text, extraCols = Seq("key" -> key))
      .select(col("key"), col("term")).distinct()
    val sizes = posts.groupBy(col("key")).agg(count(lit(1)).as("v"))
    val shared = posts.as("a")
      .join(posts.as("b"),
        col("a.term") === col("b.term") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("s1"), col("b.key").as("s2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("key").as("s1"), col("v").as("v1"))), Seq("s1"))
      .join(broadcast(sizes.select(col("key").as("s2"), col("v").as("v2"))), Seq("s2"))
      .select(col("s1"), col("s2"), col("v1"), col("v2"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) /
          (col("v1") + col("v2") - col("n_shared")).cast(DoubleType), 6).as("jaccard"))
  }

  /** Per-key quantiles + count/mean of `metric`. Quantile probabilities
    * are fixed (p25/p50/p95) so the output schema is stable. The mean
    * accumulates in decimal (exact, order-independent) and divides once
    * — same determinism discipline as the rest of the engine. */
  def lengthStats(df: DataFrame, key: Column, metric: Column,
      exact: Boolean = true): DataFrame = {
    val probs = array(lit(0.25), lit(0.5), lit(0.95))
    val q =
      if (exact) percentile(metric, probs)
      else approx_percentile(metric, probs, lit(10000))
    val dec = DataTypes.createDecimalType(38, 6)
    df.groupBy(key.as("key"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(metric.cast(dec)).cast(DoubleType) / count(lit(1)), 6).as("mean"),
        q.as("__q"))
      .select(col("key"), col("n"), col("mean"),
        round(element_at(col("__q"), 1).cast(DoubleType), 6).as("p25"),
        round(element_at(col("__q"), 2).cast(DoubleType), 6).as("p50"),
        round(element_at(col("__q"), 3).cast(DoubleType), 6).as("p95"))
  }
}
