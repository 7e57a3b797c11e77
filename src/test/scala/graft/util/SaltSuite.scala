package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavy skew: one hot key with 10k rows, 9 cold keys with 10 each
  private lazy val skewed =
    ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 9).flatMap(k => (1 to 10).map(i => (s"cold$k", i.toDouble))))
      .toDF("k", "v").repartition(8)

  test("salted sum/count equals the unsalted aggregation exactly") {
    val salted = Salt.saltedSumCount(skewed, Seq("k"), col("v"), factor = 8)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = skewed.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, c)) =>
      assert(salted(k)._2 == c, s"count for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum for $k")
    }
  }

  test("salted join equals the unsalted join (right unique per key)") {
    val right = Seq(("hot", 100), ("cold1", 1), ("cold2", 2)).toDF("k", "r")
    val salted = Salt.saltedJoin(skewed, right, "k", factor = 4)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("r").as("rsum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val plain = skewed.join(right, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("r").as("rsum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("salting actually spreads the hot key over multiple sub-groups") {
    val perSalt = skewed.filter($"k" === "hot")
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(perSalt.length > 1, "hot key must split across salts")
    assert(perSalt.max < 10000, "no single salt holds the whole hot key")
  }

  test("saltedJoin fails fast on join types broken by right-side replication") {
    val rhs = Seq(("hot", 100), ("cold1", 1)).toDF("k", "r")
    for (jt <- Seq("right", "full", "left_anti", "left_semi")) {
      val e = intercept[IllegalArgumentException] {
        Salt.saltedJoin(skewed, rhs, "k", factor = 4, joinType = jt)
      }
      assert(e.getMessage.contains("inner/left"), s"join type $jt must be rejected")
    }
  }

  test("saltPlan: only over-budget keys, exact ceil factors, share of the whole frame") {
    val df = (Seq.fill(25)("hot") ++ Seq.fill(10)("warm") ++ Seq.fill(5)("cold"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Salt.saltPlan(df, col("k"), targetPerTask = 10L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // warm is exactly AT budget (10 <= 10): not reported; hot needs
    // ceil(25/10) = 3 sub-keys; share over all 40 rows
    assert(got.toSeq == Seq(("hot", 25L, 0.625, 3L)), s"got ${got.toSeq}")
    assert(Salt.saltPlan(df, col("k"), targetPerTask = 100L).collect().isEmpty,
      "no key over budget -> empty plan")
  }
}
