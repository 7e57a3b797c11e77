package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers for hot keys at 100 TB.
  *
  * AQE's skew-join split handles sort-merge joins automatically, but two
  * shapes still need explicit salting: (a) a groupBy whose hot key floods
  * one reducer, and (b) a broadcast-infeasible join against a frame with a
  * handful of pathological keys. Both decompose the same way — spread the
  * hot key over `factor` synthetic sub-keys, do the heavy work per
  * sub-key, then recombine.
  */
object Salt {

  /** Two-phase salted aggregation: groupBy(key, salt) computes `factor`
    * partial rows per key in parallel, then the tiny per-key recombine
    * runs over factor rows per key.
    *
    * KNOW WHEN NOT TO USE IT: for plain algebraic aggregates Spark's
    * map-side partial aggregation already collapses a hot key to one row
    * per map task before the shuffle — no salting needed, and this helper
    * would just add a second shuffle. Reach for the two-phase pattern when
    * partial aggregation does NOT bound per-key state: high-cardinality
    * partial state (exact distinct / collect_list-style), or when the
    * upstream was already salted by [[saltedJoin]] and the salt is being
    * folded back out. The sum/count pair here is the recombine step for
    * those pipelines (covers avg too). */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      factor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(factor)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }

  /** Salted equi-join for a skewed LEFT frame against a non-broadcastable
    * RIGHT frame: left rows get a random salt in [0, factor); the right
    * side is replicated `factor` times (explode), so the join key becomes
    * (key, salt) and the hot key's rows spread over `factor` reducers.
    * Correct for any join whose semantics survive right-side replication
    * under a disambiguating salt — i.e. inner/left equi-joins where right
    * is unique per key or duplicates are acceptable as in the unsalted
    * join. Cost: right side shuffles factor x (use only when the right
    * side is small-ish but above the broadcast threshold). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 16, joinType: String = "inner"): DataFrame = {
    // Only join types whose semantics survive right-side replication: for
    // right/full/anti joins each UNMATCHED right row would surface factor
    // times (or flip anti semantics entirely) — fail fast instead.
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(factor)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salting planner (X101): the data-driven input to [[saltedJoin]]/
    * [[saltedSumCount]]'s `factor`. For every key whose row count
    * exceeds `targetPerTask`, emit the count, its share of the frame,
    * and `salt_factor = ceil(n / targetPerTask)` — the number of
    * sub-keys that brings the hot key back under one task's budget.
    * Empty result = no salting needed; the report is also the alert a
    * recurring pipeline files when a previously-even key goes hot.
    *
    * Determinism: counts are exact; share is an integer ratio rounded 6;
    * the factor is integer arithmetic (no float ceil). Scale shape: one
    * map-side-combined count aggregate; the hot-key FILTER collapses the
    * output to the pathological few, and the total rides as a broadcast
    * row — this diagnostic must never itself be the skewed job. */
  def saltPlan(df: DataFrame, key: Column, targetPerTask: Long = 5000000L): DataFrame = {
    require(targetPerTask > 0, s"targetPerTask must be positive, got $targetPerTask")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.filter(col("n") > targetPerTask)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("__total").cast("double"), 6).as("share"),
        // integer DIV, not double division: exact past 2^53 rows per key
        expr(s"(n + ${targetPerTask - 1}) DIV $targetPerTask").as("salt_factor"))
      .orderBy(col("n").desc, col("key").asc)
  }
}
