package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: print the static physical plan of named queries.
  * `sbt "Test/runMain graft.ShowPlan q90_line_dedup"` */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.sparkPlan.toString)
    }
    spark.stop()
  }
}
