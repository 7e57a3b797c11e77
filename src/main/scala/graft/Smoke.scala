package graft

import org.apache.spark.sql.SparkSession

/** Local smoke entry: runs SparkEntry.entry (the flagship search) exactly
  * like the driver's t1 check (rows > 0) and prints the result. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry returned ${rows.length} rows:")
    rows.foreach(r => println(s"[smoke]   $r"))
    assert(rows.nonEmpty, "entry() must return rows")
    spark.stop()
  }
}
