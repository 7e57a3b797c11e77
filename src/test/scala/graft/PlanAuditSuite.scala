package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions over the real testdata — the properties that
  * make queries scale (pushdown, pruning, broadcast, TakeOrdered instead
  * of global sort/limit funnels) must hold structurally, not just produce
  * right answers at toy sizes.
  *
  * Notes: scan pushdown is asserted via FileSourceScanExec.metadata (the
  * toString truncates long filter lists); codegen via the FINAL adaptive
  * plan (AQE only materializes WholeStageCodegen stages after execution).
  */
class PlanAuditSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def scans(name: String): Seq[Map[String, String]] =
    df(name).queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s.metadata }

  private def staticPlan(name: String): String =
    df(name).queryExecution.sparkPlan.toString

  private def finalPlan(name: String): String = {
    val frame = df(name)
    frame.collect()
    frame.queryExecution.executedPlan.toString
  }

  test("point lookup pushes the predicate into the parquet scan (S2)") {
    val pushed = scans("q02_point_lookup").map(_("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(o_orderkey,4242"), pushed)
  }

  test("range scan pushes both bounds and the quantity filter (P2)") {
    val pushed = scans("q04_range_scan").map(_("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThan(l_quantity,45.0)"), pushed)
  }

  test("projection prunes the scan to selected columns only (P1)") {
    val read = scans("q05_like_scan").map(_("ReadSchema")).mkString
    assert(read.contains("p_partkey") && read.contains("p_name") && read.contains("p_brand"), read)
    assert(!read.contains("p_retailprice") && !read.contains("p_comment"),
      s"unused columns must not be read: $read")
  }

  test("search: broadcasts, TakeOrderedAndProject top-k, no single-partition GlobalLimit") {
    val p = staticPlan("q37_search_e2e")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as a distributed top-k heap:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate/rerank joins must broadcast the small side:\n$p")
    assert(!p.contains("GlobalLimit"), s"no global-limit funnel in the default plan:\n$p")
  }

  test("search hamming stage reads only sketch columns, never the wide vector (column pruning)") {
    // build the stage-2 frame the way SearchEngine does and inspect its scan
    val emb = SparkEntry.embStore(spark, sf)
    val stage2 = emb.select(org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("binary_code"))
    val read = stage2.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s.metadata("ReadSchema") }.mkString
    assert(read.contains("vec_id"), read)
    assert(!read.contains("label"), s"pruned scan must not read unused columns: $read")
  }

  test("small-dim joins broadcast; aggregation is partial-then-final; codegen spans exist") {
    // static plan prints the full tree (AQE's final plan collapses
    // materialized stages into references, hiding the partial agg)
    val s = staticPlan("q10_revenue_by_nation")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(s.contains("partial_sum"), "map-side combine must run before the shuffle")
    val p = finalPlan("q10_revenue_by_nation")
    // WholeStageCodegenExec prints as "*(id) Operator" in tree strings
    assert(p.contains("*("), s"agg pipeline must stay inside codegen:\n$p")
  }

  test("dedup banding plan: hash aggregate on the band key, no sort-based fallback") {
    val p = finalPlan("q43_band_buckets")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("top-k orders plan as TakeOrderedAndProject, not Sort+GlobalLimit (T1/T2)") {
    val p = staticPlan("q13_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
