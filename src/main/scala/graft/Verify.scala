package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only subset filter (comma-separated names); the driver never
    // sets it, so the gate always runs the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String) = only.forall(_.contains(name))
    only.foreach { names =>
      val matched = SparkEntry.queries.keys.count(names.contains)
      val unknown = names.filterNot(SparkEntry.queries.keySet)
      System.err.println(
        s"""|##################################################################
            |# WARNING: SPARK_GRAFT_ONLY is set — running $matched of
            |# ${SparkEntry.queries.size} queries (${SparkEntry.queries.size - matched}
            |# SKIPPED). This is a dev-only SUBSET, NOT a full verification
            |# run. Unset SPARK_GRAFT_ONLY for gate/CI runs.
            |##################################################################""".stripMargin)
      if (unknown.nonEmpty)
        System.err.println(s"[verify] WARNING: unknown query names in SPARK_GRAFT_ONLY: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    SparkEntry.queries.filter { case (n, _) => keep(n) }.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same cross-query hygiene as Bench.release: operators pin eager
      // localCheckpoints that would otherwise accrete across ~150 queries
      // in this one JVM (the round-7 bench contamination mechanism)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
