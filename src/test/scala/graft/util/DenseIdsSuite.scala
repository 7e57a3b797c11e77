package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DenseIdsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ids are dense, unique, start at startAt, and follow the sort-key order") {
    val df = new scala.util.Random(7).shuffle((1 to 100).toList)
      .toDF("k").repartition(7) // scramble physical layout on purpose
    val out = DenseIds.assign(df, "id", startAt = 10L, col("k"))
    val pairs = out.select("k", "id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pairs.values.toSeq.sorted == (10L until 110L))
    // order-isomorphic: bigger key -> bigger id
    assert((1 to 100).map(k => pairs(k)) == (10L until 110L))
  }

  test("no unpartitioned WindowExec in the plan (the scale-killer this replaces)") {
    val df = (1 to 10).toDF("k")
    val plan = DenseIds.assign(df, "id", 1L, col("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"plan must not contain a window:\n$plan")
  }
}
