package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan of one `SparkEntry.queries` entry.
  *
  * `tools/run_main.sh graft.Explain <queryName> [sfDir]` — runs the query
  * (so AQE finalizes), then prints the final plan plus quick counts of the
  * operators that matter for scale audits (exchanges, reuses, scans,
  * codegen spans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    def count(p: String) = p.r.findAllIn(plan).length
    println(s"[explain] Exchange=${count("Exchange (hash|range)")} " +
      s"ReusedExchange=${count("ReusedExchange")} " +
      s"ScanParquet=${count("Scan parquet")} " +
      s"WholeStageCodegen=${count("WholeStageCodegen")} " +
      s"BroadcastExchange=${count("BroadcastExchange")}")
    spark.stop()
  }
}
