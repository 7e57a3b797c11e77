package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketingSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed tables join with NO exchange on either side") {
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 1000L).map(k => (k, k * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "graft_bkt_left", "k", 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "graft_bkt_right", "k", 4, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      // executedPlan: EnsureRequirements has run, so missing exchanges are
      // real co-location, not just a pre-preparation plan
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed-by-key tables must join shuffle-free:\n$plan")
      assert(joined.count() == 1000)
      // contrast: the same join over unbucketed frames DOES shuffle
      val unbucketed = left.join(right, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"), unbucketed)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }

  test("rejects unsafe table names") {
    intercept[IllegalArgumentException](
      Bucketing.writeBucketed(Seq((1, 1)).toDF("k", "v"), "x; drop", "k", 2))
  }
}
