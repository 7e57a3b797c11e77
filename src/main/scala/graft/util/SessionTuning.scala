package graft.util

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session defaults shared by every engine entry point
  * (Bench, Verify, Smoke, Explain, ProfileQ) — guide §2.2/§9.
  *
  * The one non-default here is AQE partition coalescing with
  * `parallelismFirst=false`: with the default (`true`), AQE only
  * coalesces post-shuffle partitions down to the session's default
  * parallelism — i.e. the partition COUNT tracks the core count, not
  * the data size, so a tiny shuffle on a 32-core driver still runs 32
  * near-empty tasks per stage (pure scheduling overhead at bench SF)
  * while a 100 TB shuffle on a big cluster gets partitions far above
  * the advisory size. `false` makes AQE size partitions by
  * `advisoryPartitionSizeInBytes` alone — the same setting is the
  * scale-correct one on a real cluster (partitions in the 100 MB-1 GB
  * band per §2.2) and at local bench SF (small shuffles coalesce to a
  * handful of tasks). Both knobs stay env-overridable so the driver's
  * bench contract (`local[$SPARK_GRAFT_CPUS]`,
  * `spark.sql.shuffle.partitions=$cpus` as the pre-AQE fan-out) is
  * unchanged; this only governs how AQE re-sizes AFTER a shuffle's
  * true byte size is known — a data-derived value, not a core-count
  * constant. */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
}
