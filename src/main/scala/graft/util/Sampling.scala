package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, engine-portable sampling for reproducible training-data
  * pipelines.
  *
  * `df.sample()`/`rand()` change membership on every run, partition count,
  * and engine — useless for a 100 TB corpus snapshot that must be
  * auditable and resumable. Hash-gate sampling instead: a row is kept iff
  * the md5 of its key falls under the rate. Same key -> same decision,
  * everywhere, forever; changing `salt` draws an independent sample.
  * Shuffle-free (a per-row filter that pushes down around column pruning)
  * and stable under repartitioning.
  */
object Sampling {

  val Buckets = 10000L

  /** Uniform bucket in [0, Buckets) from the first 7 hex chars (28 bits)
    * of md5(salt || key) — cheap, and reproducible in any engine with md5
    * (cf. [[graft.operators.Dedup]]'s hash family). Null keys hash as the
    * empty string rather than propagating null — otherwise `null < rate`
    * would silently drop them from even a rate-1.0 sample; with the
    * coalesce they get one deterministic decision per salt. */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(conv(substring(md5(concat(lit(salt), coalesce(key.cast(StringType), lit("")))),
      1, 7), 16, 10).cast(LongType), lit(Buckets))

  /** Keep ~`rate` of rows, decided per key. */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashBucket(key, salt) < math.round(rate * Buckets))
  }

  /** Deterministic train/val/test split: disjoint hash-bucket ranges
    * assign every key exactly one split label, stable across runs,
    * engines, and repartitioning (`randomSplit` is none of those — it
    * resamples per run AND can duplicate/drop rows across its outputs
    * when the upstream plan is nondeterministic). Fractions must sum to
    * 1 (±1e-9); the LAST split absorbs bucket-rounding remainder so
    * every row gets a label. */
  def hashSplit(df: DataFrame, key: Column, fractions: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    fractions.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction for '$n' must be in (0,1], got $f") }
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(!df.columns.contains("split"),
      "hashSplit emits a 'split' column; rename the existing one first")
    val bucket = hashBucket(key, salt)
    val cuts = fractions.init.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * Buckets) }.tail
    val expr = fractions.init.zip(cuts)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), cut), acc) =>
        when(bucket < cut, name).otherwise(acc) }
    df.withColumn("split", expr)
  }

  /** Per-stratum rates (e.g. downsample by language or source): rows in a
    * stratum listed in `rates` sample at that rate, everything else at
    * `defaultRate`. One pass, no shuffle — the stratum column is just
    * another row attribute. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double, salt: String = ""): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r"))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * Buckets))) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.filter(hashBucket(key, salt) < threshold)
  }

  /** Exact-proportion stratified split (X93): within each stratum, rank
    * rows by salted md5 and cut at integer boundaries `round(cum_frac·n)`
    * (round, not ceil: 0.8·10 is 8.000000000000002 in IEEE, and ceil
    * would hand train a ninth row on a ten-row stratum) — every stratum
    * lands within one row of its target fractions, where
    * [[hashSplit]] hits them only in EXPECTATION (a 50-row language can
    * land 70/30 on an 80/10/10 target; per-language eval sets need the
    * proportions to hold in every stratum, not just globally). Same
    * determinism story as the hash family: the md5 order (key as the
    * tiebreak) and the integer boundaries are identical on any engine,
    * any run, any partitioning; `salt` redraws the assignment.
    *
    * Emits the input plus `split`. Scale shape: ONE exchange keyed by
    * stratum — the rank window and the stratum-count window share it. A
    * mega-stratum makes a hot sort partition: pre-shard it into salted
    * sub-strata and union, or fall back to [[hashSplit]] for that
    * stratum and keep exactness for the small ones (where it matters). */
  def stratifiedSplit(df: DataFrame, key: Column, stratum: Column,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fractions.nonEmpty, "need at least one split")
    fractions.foreach { case (n, f) =>
      require(f > 0.0 && f <= 1.0, s"fraction for '$n' must be in (0,1], got $f") }
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(!df.columns.contains("split"),
      "stratifiedSplit emits a 'split' column; rename the existing one first")
    val ord = md5(concat(lit(salt), coalesce(key.cast(StringType), lit(""))))
    val wRank = Window.partitionBy(stratum).orderBy(ord.asc, key.asc)
    val wAll = Window.partitionBy(stratum)
    val cums = fractions.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = fractions.init.zip(cums)
      .foldRight(lit(fractions.last._1): Column) { case (((name, _), c), acc) =>
        when(col("__rn") <= round(lit(c) * col("__n")), name).otherwise(acc) }
    df.withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("split", expr)
      .drop("__rn", "__n")
  }
}
