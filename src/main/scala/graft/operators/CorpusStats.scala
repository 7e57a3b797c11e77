package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group distribution statistics over a corpus — the length/size
  * profiling every curation run starts with (how long are the documents
  * per source? where does the p95 sit before I pick a truncation
  * budget?).
  *
  * Two paths, same output shape:
  *  - `exact = true`: `percentile` — a full sort-based exact quantile.
  *    Linear-interpolation semantics identical to DuckDB's
  *    `quantile_cont`, so the result is oracle-checkable bit-for-bit.
  *    Costs a per-group sort; fine up to millions of rows per group.
  *  - `exact = false`: `approx_percentile` (Greenwald–Khanna sketch) —
  *    the 100 TB path: one streaming pass, mergeable partial sketches,
  *    bounded memory per group, rank error ≤ 1/accuracy. Not
  *    oracle-comparable (sketch outputs are engine-specific); the unit
  *    suite bounds its error against the exact path instead.
  */
object CorpusStats {

  /** Per-key vocabulary profile: document count, token total, and
    * distinct-term cardinality. `exact = true` pays the full
    * (key, term)-distinct shuffle — oracle-checkable; `exact = false`
    * swaps in `approx_count_distinct` (HyperLogLog++), the 100 TB path:
    * fixed-size mergeable sketches per partition instead of shuffling
    * the distinct pairs, at rsd relative error (default 5%). Same output
    * schema either way; the unit suite bounds the sketch against the
    * exact path. */
  def vocabStats(docs: DataFrame, key: Column, idCol: String, text: Column,
      exact: Boolean = true, rsd: Double = 0.05): DataFrame =
    TextAnalysis.postings(docs, idCol, text, extraCols = Seq("key" -> key))
      .groupBy(col("key"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        (if (exact) countDistinct(col("term"))
         else approx_count_distinct(col("term"), rsd)).as("n_terms"))

  /** Per-key corpus datasheet (Gebru et al., "Datasheets for Datasets"):
    * the one-row-per-source profile a mixture designer reads before
    * weighing sources — volume (docs, tokens, mean length), redundancy
    * (distinct content fingerprints, dup rate), quality
    * ([[TextAnalysis.qualityScore]] mean under the decimal-sum
    * discipline), and the majority language with its doc count rank
    * (ties lexicographic).
    *
    * Scale shape: every signal is a per-row map; ONE key exchange feeds
    * the main aggregate, the (key, lang) counts, and the majority window
    * (sub-key hash satisfies both clusterings), so the corpus is read
    * once and shuffled once. */
  def datasheet(docs: DataFrame, key: Column, idCol: String, text: Column,
      lang: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DataTypes.createDecimalType(38, 6)
    val perRow = docs.select(key.as("key"),
        size(TextAnalysis.tokens(text)).cast(LongType).as("__tok"),
        TextAnalysis.fingerprint(text).as("__fp"),
        TextAnalysis.qualityScore(text).as("__q"),
        lang.as("__lang"))
      .repartition(col("key"))
    val base = perRow.groupBy(col("key")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        round(sum(col("__tok")).cast(DoubleType) / count(lit(1)), 6).as("mean_tokens"),
        countDistinct(col("__fp")).as("n_contents"),
        round(sum(col("__q").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_quality"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_contents").cast(DoubleType) / col("n_docs").cast(DoubleType), 6))
    val maj = perRow.groupBy(col("key"), col("__lang")).agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("__n").desc, col("__lang").asc)))
      .filter(col("__rk") === 1)
      .select(col("key"), col("__lang").as("majority_lang"))
    base.join(maj, Seq("key"))
      .select(col("key"), col("n_docs"), col("n_tokens"), col("mean_tokens"),
        col("n_contents"), col("dup_rate"), col("mean_quality"), col("majority_lang"))
  }

  /** Multi-granularity datasheet in ONE corpus pass (X116): the
    * [[datasheet]] profile at every grouping level at once —
    * per (key, lang) leaf, per-key subtotal, and the corpus grand total —
    * via `rollup`, so the mixture designer's drill-down table never
    * re-reads the corpus per level. `level` says which rows are which:
    * 0 = (key, lang) leaf, 1 = per-key (lang rolled up), 3 = grand total;
    * rolled-up group columns read `<all>` (inputs are non-null by
    * contract — enforced — so the marker is unambiguous).
    *
    * Scale shape: Spark plans `rollup` as ONE Expand (×3 rows, map-side,
    * no I/O amplification — the corpus is still read once) into a single
    * hash aggregate whose partials collapse before the one exchange; the
    * exchange carries O(distinct (key, lang) + distinct key + 1) rows per
    * task, not corpus rows. `n_contents` adds the usual count-distinct
    * expand; fingerprints are 16 bytes, text never shuffles. */
  def datasheetRollup(docs: DataFrame, key: Column, idCol: String,
      text: Column, lang: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 6)
    val perRow = docs.select(key.as("key"), lang.as("lang"),
        size(TextAnalysis.tokens(text)).cast(LongType).as("__tok"),
        TextAnalysis.fingerprint(text).as("__fp"),
        TextAnalysis.qualityScore(text).as("__q"))
    perRow
      .rollup(col("key"), col("lang"))
      .agg(
        (grouping(col("key")) * 2 + grouping(col("lang"))).cast(LongType)
          .as("level"),
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        round(sum(col("__tok")).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_tokens"),
        countDistinct(col("__fp")).as("n_contents"),
        round(sum(col("__q").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("mean_quality"))
      .select(
        // inputs are non-null by contract, so a null here IS the rollup
        // marker, never data
        coalesce(col("key"), lit("<all>")).as("key"),
        coalesce(col("lang"), lit("<all>")).as("lang"),
        col("level"), col("n_docs"), col("n_tokens"), col("mean_tokens"),
        col("n_contents"),
        round(lit(1.0) - col("n_contents").cast(DoubleType)
          / col("n_docs").cast(DoubleType), 6).as("dup_rate"),
        col("mean_quality"))
  }

  /** Count-min sketch of corpus token frequencies (Cormode & Muthukrishnan
    * 2005): `depth` rows of `width` counters; every token occurrence
    * increments one cell per row, chosen by the engine's md5-28-bit base
    * under the [[Dedup.MinhashA]] universal hash family — deterministic and
    * engine-portable, so the SQL oracle reproduces cells bit-for-bit (no
    * JVM murmur). Point estimates ([[cmsEstimate]]) take the MIN over the
    * token's `depth` cells: always an OVERestimate, within
    * `2N/width` of truth with prob `1 - 2^-depth`.
    *
    * The 100 TB rationale: exact token counts shuffle the full vocabulary
    * (billions of terms for web corpora); the sketch is a FIXED
    * `depth x width` table with map-side combine — the exchange moves
    * O(tasks * depth * width) rows regardless of corpus or vocabulary
    * size, and sketches of corpus shards merge by cell-wise addition. */
  def cmsCells(docs: DataFrame, idCol: String, text: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= Dedup.MinhashA.length,
      s"depth must be in [1, ${Dedup.MinhashA.length}], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    TextAnalysis.postings(docs, idCol, text)
      .select(posexplode(cmsCellArray(col("term"), depth, width)).as(Seq("row", "cell")))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /** The token's `depth` cell indices (row i = universal-hash seed i over
    * the md5-28-bit base, mod width). Shared by build and probe. */
  private[operators] def cmsCellArray(term: Column, depth: Int, width: Int): Column = {
    val base = conv(substring(md5(term), 1, 7), 16, 10).cast(LongType)
    val cells = (0 until depth).map { i =>
      pmod(pmod(lit(Dedup.MinhashA(i)) * base + lit(Dedup.MinhashB(i)),
        lit(Dedup.MinhashPrime)), lit(width.toLong)).cast(IntegerType)
    }
    array(cells: _*)
  }

  /** Point-query the sketch for `terms`: min over each term's cells, 0
    * for a term hitting only empty cells. The literal probe frame joins
    * the (at most depth x width row) cell table — broadcast-sized by
    * construction. */
  def cmsEstimate(cells: DataFrame, terms: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(terms.nonEmpty, "no probe terms")
    val probes = terms.map(t => struct(lit(t).as("term")))
    val probe = cells.sparkSession.range(1).select(explode(array(probes: _*)).as("p"))
      .select(col("p.term").as("term"))
      .select(col("term"), posexplode(cmsCellArray(col("term"), depth, width))
        .as(Seq("row", "cell")))
    probe.join(cells, Seq("row", "cell"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  /** Pairwise vocabulary overlap between corpus keys (sources, languages,
    * shards): Jaccard of the DISTINCT term sets per key pair — the
    * source-similarity diagnostic behind mixture design (two crawls with
    * 0.9 vocab Jaccard are near-redundant; a source with no overlap is
    * either gold or garbage) and drift checks between corpus snapshots.
    *
    * Emits `(s1, s2, v1, v2, n_shared, jaccard)` for every key pair that
    * shares at least one term, s1 < s2.
    *
    * Scale shape: reduces to (key, term)-distinct postings; the pair
    * counts come from a term-keyed self-join — the per-term cost is
    * (#keys containing the term choose 2), bounded by the KEY count
    * (sources/languages number in the thousands), never the corpus size.
    * The vocab-size table is one row per key and broadcasts onto the
    * result. */
  def vocabOverlap(docs: DataFrame, key: Column, idCol: String,
      text: Column): DataFrame = {
    val posts = TextAnalysis.postings(docs, idCol, text, extraCols = Seq("key" -> key))
      .select(col("key"), col("term")).distinct()
    val sizes = posts.groupBy(col("key")).agg(count(lit(1)).as("v"))
    val shared = posts.as("a")
      .join(posts.as("b"),
        col("a.term") === col("b.term") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("s1"), col("b.key").as("s2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("key").as("s1"), col("v").as("v1"))), Seq("s1"))
      .join(broadcast(sizes.select(col("key").as("s2"), col("v").as("v2"))), Seq("s2"))
      .select(col("s1"), col("s2"), col("v1"), col("v2"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) /
          (col("v1") + col("v2") - col("n_shared")).cast(DoubleType), 6).as("jaccard"))
  }

  /** Per-key quantiles + count/mean of `metric`. Quantile probabilities
    * are fixed (p25/p50/p95) so the output schema is stable. The mean
    * accumulates in decimal (exact, order-independent) and divides once
    * — same determinism discipline as the rest of the engine. */
  def lengthStats(df: DataFrame, key: Column, metric: Column,
      exact: Boolean = true): DataFrame = {
    val probs = array(lit(0.25), lit(0.5), lit(0.95))
    val q =
      if (exact) percentile(metric, probs)
      else approx_percentile(metric, probs, lit(10000))
    val dec = DataTypes.createDecimalType(38, 6)
    df.groupBy(key.as("key"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(metric.cast(dec)).cast(DoubleType) / count(lit(1)), 6).as("mean"),
        q.as("__q"))
      .select(col("key"), col("n"), col("mean"),
        round(element_at(col("__q"), 1).cast(DoubleType), 6).as("p25"),
        round(element_at(col("__q"), 2).cast(DoubleType), 6).as("p50"),
        round(element_at(col("__q"), 3).cast(DoubleType), 6).as("p95"))
  }

  /** Extended statistics (X243 — the Elasticsearch `extended_stats`
    * aggregation): count/min/max/sum/avg/POPULATION variance/std per
    * key, in ONE map-side-combining aggregate — the monitoring-panel
    * summary next to [[lengthStats]]' percentile view. Variance =
    * E[x²] − E[x]² from EXACT DECIMAL power sums (order-free
    * addition, so a shuffled cluster and a single thread agree
    * bit-for-bit), clamped at 0 against float cancellation; nulls
    * excluded; round-6 outputs. Power sums carry DECIMAL(38,8) — 30
    * integer digits, so the per-row x² cast holds for |x| up to ~1e15;
    * a narrower decimal would NULL-overflow per row in Spark's
    * non-ANSI mode and sum() would silently skip those rows (a wrong
    * variance with no error, where the oracle fails loudly). */
  def extendedStats(df: DataFrame, key: Column, value: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 8)
    val v = value.cast(DoubleType)
    val agg = df.select(key.as("key"), v.as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("min"), max(col("__v")).as("max"),
        sum(col("__v").cast(dec)).as("__sx"),
        sum((col("__v") * col("__v")).cast(dec)).as("__sxx"))
    val avg = col("__sx").cast(DoubleType) / col("n").cast(DoubleType)
    val variance = greatest(lit(0.0),
      col("__sxx").cast(DoubleType) / col("n").cast(DoubleType) - avg * avg)
    agg.select(col("key"), col("n"),
      round(col("min"), 6).as("min"), round(col("max"), 6).as("max"),
      round(col("__sx").cast(DoubleType), 6).as("sum_value"),
      round(avg, 6).as("avg"),
      round(variance, 6).as("variance"),
      round(sqrt(variance), 6).as("std"))
  }

  /** Adjacency-matrix aggregation (X250 — the ES `adjacency_matrix`
    * bucket agg): given NAMED row filters, the doc_count of every
    * filter and of every pairwise intersection, keyed `"a"` and
    * `"a&b"` (names joined by `&` in the given order — the ES key
    * convention); empty buckets are omitted, also the ES behavior.
    * The overlap matrix behind co-occurrence heatmaps ("how many docs
    * are both long AND english?") without n² scans.
    *
    * ONE pass: each row emits its matched singleton + pair keys from
    * an inline literal array of `when()` flags — no self-join, no
    * per-filter scan — and a map-side-combining count reduces to at
    * most n(n+1)/2 groups (ES caps n at 100 for the same quadratic
    * reason; the cap is enforced here too). */
  def adjacencyMatrix(df: DataFrame,
      filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "no filters")
    require(filters.size <= 100, s"at most 100 filters (ES cap), got ${filters.size}")
    val names = filters.map(_._1)
    require(names.distinct.size == names.size, s"duplicate filter name in $names")
    require(names.forall(n => n.nonEmpty && !n.contains('&')),
      s"filter names must be non-empty and '&'-free: $names")
    val singles = filters.map { case (n, c) =>
      when(c, lit(n)).otherwise(lit(null)) }
    val pairs = for {
      i <- filters.indices
      j <- (i + 1) until filters.size
    } yield when(filters(i)._2 && filters(j)._2,
      lit(s"${names(i)}&${names(j)}")).otherwise(lit(null))
    df.select(explode(array(singles ++ pairs: _*)).as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("doc_count"))
  }

  /** The shared one-pass tail of [[filtersAgg]]/[[rangeAgg]]/
    * [[dateRangeAgg]]: a single aggregate row of per-bucket conditional
    * counts (map-side partials collapse each task to one row — no
    * row-mass shuffle), unpivoted into (key, doc_count) rows by a
    * bounded `stack`. Every keyed bucket emits, zero or not. */
  private def condCountsStacked(df: DataFrame,
      keyed: Seq[(String, Column)]): DataFrame = {
    val agg = df.agg(
      count(when(keyed.head._2, 1)).as("c0"),
      keyed.zipWithIndex.tail.map { case ((_, c), i) =>
        count(when(c, 1)).as(s"c$i") }: _*)
    val stackSql = s"stack(${keyed.size}, " + keyed.zipWithIndex.map {
      case ((k, _), i) => s"'${k.replace("'", "''")}', c$i"
    }.mkString(", ") + ") AS (key, doc_count)"
    agg.select(expr(stackSql))
  }

  /** Filters aggregation (X269 — the ES `filters` bucket agg, the
    * named-bucket singleton form of [[adjacencyMatrix]]): the
    * doc_count of every NAMED row filter — "how many docs are long /
    * english / flagged" as one dashboard row set. Unlike
    * [[adjacencyMatrix]] (which omits empty intersections), every
    * requested bucket emits, zero or not — a keyed filter is part of
    * the requested output shape, the ES response convention. With
    * `otherBucketKey` set, docs matching NO filter count into one
    * extra bucket of that name (ES `other_bucket_key`), which also
    * always emits.
    *
    * ONE pass, no shuffle of row-mass at all: a single aggregate row
    * of per-filter conditional counts (map-side partials collapse each
    * task to one row), unpivoted by a bounded `stack` — cheaper even
    * than the adjacency explode, since no per-row key array is built. */
  def filtersAgg(df: DataFrame, filters: Seq[(String, Column)],
      otherBucketKey: Option[String] = None): DataFrame = {
    require(filters.nonEmpty, "no filters")
    val names = filters.map(_._1) ++ otherBucketKey
    require(names.distinct.size == names.size, s"duplicate bucket name in $names")
    require(names.forall(_.nonEmpty), "bucket names must be non-empty")
    // a row whose filter predicates are all null/false matched nothing:
    // coalesce pins the null case into the other bucket (ES behavior)
    val other = otherBucketKey.map { k =>
      (k, !coalesce(filters.map(_._2).reduce(_ || _), lit(false))) }
    condCountsStacked(df, filters ++ other)
  }

  /** Terms aggregation with the other-mass row (X253 — the ES `terms`
    * agg's `sum_other_doc_count`, the honesty field dashboards forget):
    * the top `size` buckets by (doc_count desc, key asc) PLUS one
    * `__sum_other__` row carrying everything the cut dropped — so the
    * rendered bar chart and the corpus total always reconcile. Empty
    * other-mass omits the row (nothing dropped). Plan: one map-side-
    * combining count over the input — PINNED (eager localCheckpoint,
    * the [[graft.util.Pins]] contract: release after materializing the
    * result), because the aggregate has three consumers (the sentinel
    * check, the top cut, the other-mass anti-join) and unpinned each
    * would re-run the groupBy over the full input — then a size-heap
    * (TakeOrderedAndProject) for the cut and one anti-join aggregate
    * over the bucket-cardinality pin for the remainder — no global
    * window, no driver-side bucket list. `__sum_other__` is reserved:
    * a real key equal to it would alias the sentinel, so it is
    * rejected (one cheap job over the pin). */
  def termsAggWithOther(df: DataFrame, key: Column, size: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    val counts = df.groupBy(key.cast(StringType).as("key"))
      .agg(count(lit(1)).as("doc_count"))
      .localCheckpoint(true)
    // the sentinel require is exactly the throw-after-pin case: release
    // the pin before propagating so a rejected call doesn't strand it
    try {
      require(counts.filter(col("key") === "__sum_other__").isEmpty,
        "key value '__sum_other__' collides with the sentinel row")
      val top = counts
        .orderBy(col("doc_count").desc, col("key").asc).limit(size)
      val other = counts.join(top, Seq("key"), "left_anti")
        .agg(sum(col("doc_count")).as("doc_count"))
        .filter(col("doc_count").isNotNull)
        .select(lit("__sum_other__").as("key"), col("doc_count"))
      top.unionAll(other)
    } catch {
      case t: Throwable => graft.util.Pins.release(counts); throw t
    }
  }

  /** String statistics (the ES `string_stats` agg with
    * `show_distribution`'s entropy): per key over a string column —
    * value count, min/max/avg length, and the Shannon entropy (base 2,
    * the ES convention) of the CHARACTER distribution across all the
    * key's values; the quick text-health panel (a collapsed-entropy
    * source is repeated boilerplate; a spiked length distribution is a
    * truncation bug). Nulls excluded. Determinism: each character's
    * −p·log₂p term rounds to 6 and sums in DECIMAL(38,6) — order-free
    * addition, any cluster layout reproduces the same bits (the
    * engine-wide float-sum discipline); the single-character p = 1
    * case pins to exact 0 (IEEE would give −0.0). Plan: one length
    * aggregate + one per-(key, char) count (map-side combined;
    * characters per key ≤ alphabet — tiny) joined back. */
  def stringStats(df: DataFrame, key: Column, str: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 6)
    val s = df.select(key.cast(StringType).as("key"),
      str.cast(StringType).as("__s")).filter(col("__s").isNotNull)
    val lens = s.groupBy(col("key")).agg(
      count(lit(1)).as("count"),
      min(length(col("__s"))).cast(LongType).as("min_length"),
      max(length(col("__s"))).cast(LongType).as("max_length"),
      sum(length(col("__s"))).cast(LongType).as("__sumlen"))
    val chars = s.select(col("key"), explode(split(col("__s"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("key"), col("ch")).agg(count(lit(1)).as("cnt"))
    val tot = chars.groupBy(col("key")).agg(sum(col("cnt")).as("__tot"))
    val p = col("cnt").cast(DoubleType) / col("__tot").cast(DoubleType)
    val ent = chars.join(tot, Seq("key"))
      .select(col("key"),
        when(col("cnt") === col("__tot"), lit(0.0))
          .otherwise(round(-p * log2(p), 6)).cast(dec).as("__term"))
      .groupBy(col("key"))
      .agg(sum(col("__term")).cast(DoubleType).as("entropy"))
    lens.join(ent, Seq("key"))
      .select(col("key"), col("count"), col("min_length"),
        col("max_length"),
        round(col("__sumlen").cast(DoubleType) /
          col("count").cast(DoubleType), 6).as("avg_length"),
        col("entropy"))
  }

  /** Top-metrics aggregation (the ES `top_metrics` agg, size = 1 —
    * per bucket the metric values OF the extreme document: "per
    * language, the longest doc's source and id"; the argmax rail
    * next to X247's top_hits): one map-side-combined `max_by`
    * aggregate — per-task partial maxima, no window, no per-bucket
    * sort, so the shuffle carries one candidate row per (task, key).
    * ES leaves sort ties undefined; an oracle-gated engine cannot —
    * `tiebreak` must complete a total order (end it in a unique id,
    * the [[graft.operators.Curation.capPerKey]] rule): the winner is
    * the max (sort, tiebreak) pair, i.e. ORDER BY sort DESC, tiebreak
    * DESC. Docs with a null sort value are skipped (the ES missing
    * rule). Output: (key, doc_count, <metric columns>). */
  def topMetrics(df: DataFrame, key: Column, sort: Column,
      tiebreak: Column, metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "top_metrics needs at least one metric")
    val names = metrics.map(_._1)
    require(names.distinct.size == names.size, s"duplicate metric in $names")
    val packed = struct(metrics.map { case (n, c) => c.as(n) }: _*)
    df.filter(sort.isNotNull)
      .groupBy(key.cast(StringType).as("key"))
      .agg(count(lit(1)).as("doc_count"),
        max_by(packed, struct(sort.as("__s"), tiebreak.as("__t"))).as("__m"))
      .select(Seq(col("key"), col("doc_count")) ++
        names.map(n => col(s"__m.$n").as(n)): _*)
  }

  /** Multi-terms aggregation (the ES `multi_terms` agg — X253's
    * terms + sum_other honesty row over a COMPOSITE key): buckets
    * keyed by the value TUPLE, rendered as the `|`-joined key string
    * (the ES `key_as_string` convention — ES also returns the raw
    * array; one string column keeps the frame flat and the oracle
    * trivial), docs missing ANY key component are skipped (the ES
    * rule: multi_terms has no per-component `missing` default), top
    * `size` buckets by (doc_count desc, key asc) plus `__sum_other__`
    * carrying everything the cut dropped. Pure composition over
    * [[termsAggWithOther]] — same pin, same heap, same sentinel
    * guard. A key component containing `|` would alias another
    * tuple's rendering — the caller's delimiter contract, exactly as
    * in ES's key_as_string. */
  def multiTermsAgg(df: DataFrame, keys: Seq[Column], size: Int): DataFrame = {
    require(keys.size >= 2,
      s"multi_terms needs at least two key columns, got ${keys.size}")
    termsAggWithOther(
      df.filter(keys.map(_.isNotNull).reduce(_ && _)),
      concat_ws("|", keys.map(_.cast(StringType)): _*), size)
  }

  /** Range aggregation (X254 — the ES `range` agg): per [from, to)
    * range over `value`, the bucket's doc_count — ranges may OVERLAP
    * (a row lands in every range containing it) and EMPTY ranges still
    * emit (both the ES conventions; unlike `filters`/adjacency, a
    * keyed range is part of the requested output shape). Keys are the
    * ES `from-to` form with `*` for an open end. ONE pass: a single
    * aggregate row of per-range conditional counts, unpivoted by a
    * bounded `stack` — no per-range scan, no join. Nulls match no
    * range (the ES missing-value rule). */
  def rangeAgg(df: DataFrame, value: Column,
      ranges: Seq[(Option[Double], Option[Double])]): DataFrame = {
    require(ranges.nonEmpty, "no ranges")
    require(ranges.forall { case (f, t) =>
      f.nonEmpty || t.nonEmpty }, "a range needs at least one bound")
    require(ranges.forall { case (f, t) =>
      f.isEmpty || t.isEmpty || f.get < t.get },
      s"every range needs from < to: $ranges")
    def fmt(d: Double) =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    val keyed = ranges.map { case (f, t) =>
      val k = s"${f.map(fmt).getOrElse("*")}-${t.map(fmt).getOrElse("*")}"
      val cond = (f.map(value >= _) ++ t.map(value < _))
        .reduce(_ && _)
      (k, cond)
    }
    require(keyed.map(_._1).distinct.size == keyed.size,
      s"duplicate range key in ${keyed.map(_._1)}")
    condCountsStacked(df, keyed)
  }

  /** Date-range aggregation (X274 — the ES `date_range` agg, the
    * calendar sibling of [[rangeAgg]]): per [from, to) timestamp range
    * over `ts`, the bucket's doc_count — ranges may overlap, empty
    * ranges still emit, nulls match no range (all the [[rangeAgg]] /
    * ES conventions). Bounds arrive as `yyyy-MM-dd HH:mm:ss` literals
    * read under the session timezone (UTC-pinned in this engine — the
    * X271 contract); keys are the ES `from-to` form with `*` for an
    * open end, carrying the literal bound text. `ts` must be a
    * TIMESTAMP column (cast TIMESTAMP_NTZ at the call site — under the
    * UTC session the cast is the identity wall-clock reading). Same
    * ONE-pass plan as [[rangeAgg]]: a single conditional-count
    * aggregate row unpivoted by a bounded `stack`. */
  def dateRangeAgg(df: DataFrame, ts: Column,
      ranges: Seq[(Option[String], Option[String])]): DataFrame = {
    require(ranges.nonEmpty, "no ranges")
    require(ranges.forall { case (f, t) =>
      f.nonEmpty || t.nonEmpty }, "a range needs at least one bound")
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    def parse(s: String) = java.time.LocalDateTime.parse(s, fmt)
    require(ranges.forall { case (f, t) =>
      f.isEmpty || t.isEmpty || parse(f.get).isBefore(parse(t.get)) },
      s"every range needs from < to: $ranges")
    val keyed = ranges.map { case (f, t) =>
      val k = s"${f.getOrElse("*")}-${t.getOrElse("*")}"
      val cond = (f.map(x => ts >= to_timestamp(lit(x))) ++
          t.map(x => ts < to_timestamp(lit(x))))
        .reduce(_ && _)
      (k, cond)
    }
    require(keyed.map(_._1).distinct.size == keyed.size,
      s"duplicate range key in ${keyed.map(_._1)}")
    condCountsStacked(df, keyed)
  }

  /** Parse a dotted-quad IPv4 string column to its unsigned 32-bit
    * value as a LONG — the comparable form every ip-range operation
    * sorts and buckets on. Strictly four dot-separated decimal octets,
    * each 0-255 with no sign/whitespace/hex; anything else (IPv6,
    * hostnames, octets > 255, empty parts) is null — an ip column in a
    * crawl log is attacker-controlled text, so the parser REJECTS
    * rather than guesses. Pure Column arithmetic (split + guards +
    * shifts), codegen end-to-end. */
  def ipv4ToLong(ip: Column): Column = {
    val parts = split(ip, "\\.", -1)
    def octet(i: Int) = {
      // try_element_at, not element_at: ANSI element_at throws on an
      // out-of-bounds index, and common-subexpression elimination can
      // hoist the access past the size guard below
      val s = try_element_at(parts, lit(i))
      // decimal digits only, 1-3 chars; cast AFTER the shape check so
      // '08' parses (it is valid decimal) but '+8'/'' /'1e2' never do
      when(s.rlike("^[0-9]{1,3}$"), s.cast(LongType)).otherwise(lit(null))
    }
    val o = (1 to 4).map(octet)
    when(size(parts) === 4 &&
        o.map(c => c.isNotNull && c <= 255).reduce(_ && _),
      o.reduce((a, b) => a * 256 + b))
      .otherwise(lit(null).cast(LongType))
  }

  /** IP-range aggregation (the ES `ip_range` agg — the address-space
    * sibling of [[rangeAgg]]/[[dateRangeAgg]], completing the range
    * family): per [from, to) IPv4 range the doc_count — overlap
    * allowed, empty ranges emit, `to` exclusive, unparseable/missing
    * ips match nothing (the ES missing rule, via [[ipv4ToLong]]'s
    * strict null). Keys are the ES from-to form with `*` open ends.
    * The same ONE-pass conditional-count row + bounded stack as the
    * whole range family (shared [[condCountsStacked]] tail — no
    * row-mass shuffle). */
  def ipRangeAgg(df: DataFrame, ip: Column,
      ranges: Seq[(Option[String], Option[String])]): DataFrame = {
    require(ranges.nonEmpty, "no ranges")
    require(ranges.forall { case (f, t) =>
      f.nonEmpty || t.nonEmpty }, "a range needs at least one bound")
    def lv(s: String): Long = {
      val ps = s.split("\\.", -1)
      require(ps.length == 4 && ps.forall(p => p.matches("[0-9]{1,3}") &&
        p.toLong <= 255), s"bad IPv4 literal '$s'")
      ps.map(_.toLong).reduce((a, b) => a * 256 + b)
    }
    require(ranges.forall { case (f, t) =>
      f.isEmpty || t.isEmpty || lv(f.get) < lv(t.get) },
      s"every range needs from < to: $ranges")
    val v = ipv4ToLong(ip)
    val keyed = ranges.map { case (f, t) =>
      val k = s"${f.getOrElse("*")}-${t.getOrElse("*")}"
      val cond = (f.map(x => v >= lv(x)) ++ t.map(x => v < lv(x)))
        .reduce(_ && _)
      (k, cond)
    }
    require(keyed.map(_._1).distinct.size == keyed.size,
      s"duplicate range key in ${keyed.map(_._1)}")
    condCountsStacked(df, keyed)
  }

  /** Rare-terms aggregation (X251 — the ES `rare_terms` bucket agg,
    * the long-tail complement of `terms`): the terms whose document
    * frequency is ≤ `maxDocCount` — "what occurs almost never", the
    * typo/spam/anomaly surface a terms-agg's top-N can never show.
    * Served ENTIRELY from the (term, df) census the caller provides
    * (an [[graft.sources.InvertedIndex.vocab]] read — vocabulary-sized,
    * postings never opened), which is the scale story: ES needs a
    * special agg because a naive terms-agg ordered ascending would
    * ship every shard's full term set; a census sidecar makes the
    * long tail one filter. */
  def rareTerms(census: DataFrame, maxDocCount: Long): DataFrame = {
    require(maxDocCount >= 1, s"maxDocCount must be >= 1, got $maxDocCount")
    census.select(col("term"), col("df"))
      .filter(col("df") <= maxDocCount)
  }

  /** Percentile ranks (X262 — the ES `percentile_ranks` aggregation,
    * the inverse of [[graft.operators.Sessionize.percentilesExact]]):
    * per key and requested value x, the percentage of observations ≤ x
    * — the empirical CDF, exact (percent = 100·|{v ≤ x}| / n, round-6;
    * the right-continuous convention, stated — ES's own exact mode
    * reports the same step function). Nulls excluded. ONE map-side-
    * combining aggregate carrying |xs| conditional counts, unpivoted
    * by a bounded stack — no sort, no window, no per-x pass. */
  def percentileRanks(df: DataFrame, key: Column, value: Column,
      xs: Seq[Double]): DataFrame = {
    require(xs.nonEmpty, "no values requested")
    require(xs.distinct.size == xs.size, s"duplicate value in $xs")
    val v = value.cast(DoubleType)
    val agg = df.select(key.as("key"), v.as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        xs.zipWithIndex.map { case (x, i) =>
          count(when(col("__v") <= x, 1)).as(s"le$i") }: _*)
    val stackSql = s"stack(${xs.size}, " + xs.zipWithIndex.map {
      case (x, i) => s"CAST($x AS DOUBLE), le$i"
    }.mkString(", ") + ") AS (x, __le)"
    agg.select(col("key"), col("n"), expr(stackSql))
      .select(col("key"), col("x"), col("n"),
        round(lit(100.0) * col("__le").cast(DoubleType) /
          col("n").cast(DoubleType), 6).as("percent"))
  }

  /** Welch's unpaired t-test (X268 — the ES `t_test` aggregation,
    * `"type": "heteroscedastic"`, its default): the t-statistic for
    * "do these two segments have the same mean" — the A/B readout next
    * to [[extendedStats]]' single-segment panel. Two filter-defined
    * samples from ONE pass (conditional exact-DECIMAL power sums, the
    * [[matrixStats]] discipline), then Welch: t = (m_a − m_b) /
    * √(s²_a/n_a + s²_b/n_b) with SAMPLE variances (n−1), clamped at 0
    * against cancellation, round-6. A sample with n < 2 — or a zero
    * denominator (two constant samples) — yields a null t (no fake
    * number where the statistic is undefined). Degrees of freedom /
    * p-value are the caller's table lookup, stated — the engine emits
    * the deterministic statistic, not a distribution approximation.
    * Rows matching NEITHER filter are ignored; a row matching BOTH
    * counts in both samples — the two filters are independent, exactly
    * ES's filter semantics (choose disjoint filters for a meaningful
    * test; the operator doesn't guess). */
  def welchTTest(df: DataFrame, value: Column,
      isA: Column, isB: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 8)
    val v = value.cast(DoubleType)
    val base = df.select(v.as("__v"), isA.as("__a"), isB.as("__b"))
      .filter(col("__v").isNotNull)
    val agg = base.agg(
      count(when(col("__a"), 1)).as("n_a"),
      count(when(col("__b"), 1)).as("n_b"),
      sum(when(col("__a"), col("__v")).cast(dec)).as("__sa"),
      sum(when(col("__b"), col("__v")).cast(dec)).as("__sb"),
      sum(when(col("__a"), col("__v") * col("__v")).cast(dec)).as("__saa"),
      sum(when(col("__b"), col("__v") * col("__v")).cast(dec)).as("__sbb"))
    val naD = col("n_a").cast(DoubleType)
    val nbD = col("n_b").cast(DoubleType)
    val ma = col("__sa").cast(DoubleType) / naD
    val mb = col("__sb").cast(DoubleType) / nbD
    // sample variance: (Σx² − n·m²) / (n − 1), clamped
    val va = greatest(lit(0.0),
      (col("__saa").cast(DoubleType) - naD * ma * ma) / (naD - lit(1.0)))
    val vb = greatest(lit(0.0),
      (col("__sbb").cast(DoubleType) - nbD * mb * mb) / (nbD - lit(1.0)))
    val denom = sqrt(va / naD + vb / nbD)
    agg.select(col("n_a"), col("n_b"),
      round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && denom > 0.0,
        round((ma - mb) / denom, 6))
        .otherwise(lit(null).cast(DoubleType)).as("t_stat"))
  }

  /** Weighted average (X265 — the ES `weighted_avg` aggregation): per
    * key, Σ(value·weight)/Σweight — the revenue-weighted /
    * importance-weighted mean plain avg silently misstates. Rows with
    * a null value OR null weight are excluded (the ES row-wise rule);
    * a key whose weights sum to zero averages to null (the ES
    * convention — no division by zero, no fake 0). Numerator and
    * denominator accumulate in exact DECIMAL(38,8) (order-free), one
    * division in double behind round-6; ONE map-side-combining
    * aggregate. */
  def weightedAvg(df: DataFrame, key: Column, value: Column,
      weight: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 8)
    df.select(key.as("key"), value.cast(DoubleType).as("__v"),
        weight.cast(DoubleType).as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        sum((col("__v") * col("__w")).cast(dec)).as("__sn"),
        sum(col("__w").cast(dec)).as("__sd"))
      .select(col("key"), col("n"),
        when(col("__sd") =!= 0,
          round(col("__sn").cast(DoubleType) /
            col("__sd").cast(DoubleType), 6))
          .otherwise(lit(null).cast(DoubleType)).as("weighted_avg"))
  }

  /** Matrix statistics (X264 — the ES `matrix_stats` aggregation's
    * load-bearing half: per-pair covariance and Pearson correlation,
    * plus per-field count/mean/population variance): ONE map-side-
    * combining aggregate of EXACT DECIMAL power sums (Σa, Σb, Σa²,
    * Σb², Σab — order-free addition, any cluster layout reproduces the
    * same bits; DECIMAL(38,8) holds |x| to ~1e15 as [[extendedStats]]),
    * formulas in double behind round-6: var = E[x²]−E[x]² clamped at 0
    * against cancellation, cov = E[ab]−E[a]E[b], corr = cov/√(varA·
    * varB) (0 when either variance is 0 — the degenerate-column
    * convention). Rows missing EITHER field are excluded (the ES
    * row-wise rule). Skewness/kurtosis are out of scope, stated. */
  def matrixStats(df: DataFrame, a: Column, b: Column): DataFrame = {
    val dec = DataTypes.createDecimalType(38, 8)
    val base = df.select(a.cast(DoubleType).as("__a"),
        b.cast(DoubleType).as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val agg = base.agg(count(lit(1)).as("n"),
      sum(col("__a").cast(dec)).as("__sa"),
      sum(col("__b").cast(dec)).as("__sb"),
      sum((col("__a") * col("__a")).cast(dec)).as("__saa"),
      sum((col("__b") * col("__b")).cast(dec)).as("__sbb"),
      sum((col("__a") * col("__b")).cast(dec)).as("__sab"))
    val nD = col("n").cast(DoubleType)
    val meanA = col("__sa").cast(DoubleType) / nD
    val meanB = col("__sb").cast(DoubleType) / nD
    val varA = greatest(lit(0.0),
      col("__saa").cast(DoubleType) / nD - meanA * meanA)
    val varB = greatest(lit(0.0),
      col("__sbb").cast(DoubleType) / nD - meanB * meanB)
    val cov = col("__sab").cast(DoubleType) / nD - meanA * meanB
    val corr = when(varA > 0.0 && varB > 0.0,
      cov / sqrt(varA * varB)).otherwise(lit(0.0))
    agg.select(col("n"),
      round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
      round(varA, 6).as("var_a"), round(varB, 6).as("var_b"),
      round(cov, 6).as("covariance"), round(corr, 6).as("correlation"))
  }

  /** Vocabulary coverage curve (X97): the fraction of total token MASS
    * the top-N most frequent types cover, for a ladder of N — the
    * tokenizer-sizing table (how big must the vocab be before <1% of
    * running text is OOV?) and the Zipf sanity check (a corpus whose
    * top-10k types cover 99.9% is templated; organic text plateaus
    * slower). Emits (top_n, covered_tokens, total_tokens, coverage).
    *
    * Scale shape: ONE census exchange builds the vocab table, pinned
    * (localCheckpoint) because every ladder step re-reads it — the
    * multi-consumer working-set discipline; each ladder step is then a
    * TakeOrdered heap of its N rows + a scalar sum (NO unpartitioned
    * row_number over the vocabulary, which would funnel a 100M-type
    * census through one task); the total rides as a broadcast row.
    *
    * The operator is EAGER: the |ladder|-row result is materialized
    * before returning (a bounded driver collect, same class as the
    * centroid/quantizer anchors) so the census pin can be released
    * here rather than leaking into the session — the round-7 bench
    * measured dead census pins accreting across queries in one JVM. */
  def vocabCoverage(docs: DataFrame, text: Column,
      ladder: Seq[Int] = Seq(10, 100, 1000, 10000)): DataFrame = {
    require(ladder.nonEmpty && ladder.forall(_ > 0), s"bad ladder $ladder")
    val census = docs.select(explode(TextAnalysis.tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = census.agg(sum(col("n")).as("__total"))
    val steps = ladder.sorted.map { n =>
      census.orderBy(col("n").desc, col("tok").asc).limit(n)
        .agg(coalesce(sum(col("n")), lit(0L)).as("covered_tokens"))
        .select(lit(n).as("top_n"), col("covered_tokens"))
    }
    val out = steps.reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      .select(col("top_n"), col("covered_tokens"),
        col("__total").as("total_tokens"),
        round(col("covered_tokens").cast(DoubleType) /
          col("__total").cast(DoubleType), 6).as("coverage"))
    val rows = out.collect() // |ladder| rows
    graft.util.Pins.release(census)
    val spark = docs.sparkSession
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** N-gram diversity per source (X92): distinct-n ratios (Li et al.,
    * NAACL 2016) for n = 1..`maxN` — THE cheap tell for templated or
    * model-generated text (a synthetic source shows distinct-2/3 far
    * below an organic one at equal volume; repetition loops crater it).
    * Emits (source, n, n_grams, n_distinct, distinct_ratio).
    *
    * One corpus pass: all n-gram orders explode from a single staged
    * token array (struct-tagged, flattened), so the scan and tokenize
    * run once, not maxN times. Distinct counts are EXACT by default
    * (oracle-checkable); at 100 TB pass `approx = true`:
    * `approx_count_distinct` (HyperLogLog++, relative standard deviation
    * `rsd`) — the [[lengthStats]] exact/sketch duality, same plan shape
    * with the exact-distinct expand collapsed to a constant-size HLL
    * partial per (source, n). The suite pins the ratio within ~3·rsd of
    * exact. */
  def ngramDiversity(docs: DataFrame, source: Column, text: Column,
      maxN: Int = 3, approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    require(maxN >= 1 && maxN <= 5, s"maxN must be in [1,5], got $maxN")
    val staged = docs.select(source.as("source"),
      TextAnalysis.tokens(text).as("__toks"))
    val grams = flatten(array((1 to maxN).map { n =>
      transform(TextAnalysis.shinglesFromTokens(col("__toks"), n),
        s => struct(lit(n).as("n"), s.as("gram")))
    }: _*))
    staged.select(col("source"), explode(grams).as("__g"))
      .select(col("source"), col("__g.n").as("n"), col("__g.gram").as("gram"))
      .filter(col("gram") =!= "")
      .groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("n_grams"),
        (if (approx) approx_count_distinct(col("gram"), rsd)
         else countDistinct(col("gram"))).as("n_distinct"))
      .select(col("source"), col("n"), col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast(DoubleType) / col("n_grams"), 6).as("distinct_ratio"))
  }

  /** Per-source Zipf fit (X160): least-squares slope of ln(freq) against
    * ln(rank) over each source's top-`topN` terms — the corpus-health
    * datasheet row next to [[ngramDiversity]]: natural prose sits near
    * slope −1 (Zipf 1949); templated/boilerplate sources flatten (the
    * head repeats), gibberish/ID-heavy sources steepen past −1.5. A
    * drifted slope between crawls flags a changed generator even when
    * volume and vocabulary look stable. Emits per source:
    * `(source, n_terms, slope, intercept, r2)` — slope/intercept of the
    * log-log line, r² the fit quality (NULL when fewer than 2 ranked
    * terms — no line to fit).
    *
    * Determinism: rank ties break lexically (the [[vocabCoverage]]
    * rule); per-term ln(rank)/ln(freq) round-6 ([[graft.operators
    * .Curation.dsirWeights]]'s transcendental discipline), the five fit
    * moments accumulate in DECIMAL(38,6) — exact and order-independent —
    * and the closed-form slope/intercept/r² is one pinned double op
    * sequence mirrored verbatim in the oracle. Scale shape: one map-side
    * combined census collapses text to the vocabulary, the per-source
    * top-`topN` cut is a WindowGroupLimit-partial rank (the
    * [[graft.operators.TextAnalysis.bigramTable]] audit shape), and the
    * fit is a ≤sources×topN aggregate — raw text never shuffles. */
  def zipfFit(docs: DataFrame, source: Column, text: Column,
      topN: Int = 200): DataFrame = {
    require(topN >= 2 && topN <= 100000, s"topN must be in [2,100000], got $topN")
    import org.apache.spark.sql.expressions.Window
    val dec = DataTypes.createDecimalType(38, 6)
    val counts = docs
      .select(source.as("source"), explode(TextAnalysis.tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("freq"))
    val ranked = counts
      .withColumn("rank", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("freq").desc, col("tok").asc)))
      .filter(col("rank") <= topN)
      .select(col("source"),
        round(log(col("rank").cast(DoubleType)), 6).as("x"),
        round(log(col("freq").cast(DoubleType)), 6).as("y"))
    val moments = ranked.groupBy(col("source")).agg(
      count(lit(1)).as("n_terms"),
      sum(col("x").cast(dec)).cast(DoubleType).as("__sx"),
      sum(col("y").cast(dec)).cast(DoubleType).as("__sy"),
      // products re-round to 6 BEFORE the decimal cast: the cast's own
      // rounding of a full-precision double is not engine-pinned; round()
      // is (the established transcendental discipline)
      sum(round(col("x") * col("x"), 6).cast(dec)).cast(DoubleType).as("__sxx"),
      sum(round(col("y") * col("y"), 6).cast(dec)).cast(DoubleType).as("__syy"),
      sum(round(col("x") * col("y"), 6).cast(dec)).cast(DoubleType).as("__sxy"))
    val n = col("n_terms").cast(DoubleType)
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varY = n * col("__syy") - col("__sy") * col("__sy")
    val cov = n * col("__sxy") - col("__sx") * col("__sy")
    val slope = cov / varX
    moments.select(col("source"), col("n_terms"),
      when(col("n_terms") > 1, round(slope, 6)).as("slope"),
      when(col("n_terms") > 1,
        round((col("__sy") - slope * col("__sx")) / n, 6)).as("intercept"),
      when(col("n_terms") > 1,
        round((cov / (sqrt(varX) * sqrt(varY))) *
          (cov / (sqrt(varX) * sqrt(varY))), 6)).as("r2"))
  }

  /** Vocabulary-growth curve (X161; Heaps' law, Heaps 1978): vocabulary
    * size and token total at each PREFIX of the corpus in ingestion
    * order (ascending `order`) — the curve that says whether more crawl
    * still buys new vocabulary (V ≈ K·T^β, natural text β ≈ 0.4–0.6: a
    * flattening curve means new data repeats the old, a β near 1 means
    * ID/noise churn) and sizes the tokenizer budget alongside
    * [[vocabCoverage]]. Prefixes are ORDER-KEY cutoffs (`__ord ≤ cutoff`,
    * the caller's id column in practice — no global row numbering, which
    * would be a single-partition window): each grid row reports
    * `(cutoff, n_docs, n_tokens, vocab)` for that prefix.
    *
    * ONE corpus pass, not |grid| passes (the X142 grid discipline): a
    * term enters the vocabulary at its FIRST document (min order — the
    * same first-occurrence idea as [[graft.operators.Dedup]]'s
    * keep-first), tokens accumulate per document; the literal grid then
    * BROADCAST theta-joins both frames — each light (ord, n) row fans
    * out to ≤|grid| copies, text never shuffles. Determinism: integer
    * counts only. */
  def vocabGrowth(docs: DataFrame, order: Column, text: Column,
      grid: Seq[Long]): DataFrame = {
    require(grid.nonEmpty, "need at least one cutoff")
    require(grid.distinct.size == grid.size, s"duplicate cutoffs: $grid")
    val spark = docs.sparkSession
    import spark.implicits._
    val staged = docs.select(order.cast(LongType).as("__ord"),
      TextAnalysis.tokens(text).as("__toks"))
    val firstSeen = staged
      .select(col("__ord"), explode(col("__toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(min(col("__ord")).as("__first"))
    val docToks = staged.select(col("__ord"),
      size(filter(col("__toks"), t => t =!= "")).cast(LongType).as("__n"))
    val g = broadcast(grid.sorted.toDF("cutoff"))
    // theta-joins against the broadcast grid: each light row fans out to
    // ≤|grid| copies — (ord, n) longs and vocab terms only, never text
    val vocabAt = g.join(firstSeen, col("__first") <= col("cutoff"), "left")
      .groupBy(col("cutoff"))
      .agg(count(col("__first")).as("vocab"))
    val toksAt = g.join(docToks, col("__ord") <= col("cutoff"), "left")
      .groupBy(col("cutoff"))
      .agg(count(col("__ord")).as("n_docs"),
        coalesce(sum(col("__n")), lit(0L)).as("n_tokens"))
    toksAt.join(vocabAt, Seq("cutoff"))
      .select(col("cutoff"), col("n_docs"), col("n_tokens"), col("vocab"))
  }

  /** Per-document OOV rate against the corpus's own top-`vocabSize`
    * vocabulary (X110): the per-doc complement of [[vocabCoverage]]'s
    * corpus curve — the curve sizes the tokenizer, THIS finds the
    * documents the chosen vocabulary fails (code in a prose corpus,
    * foreign-language strays, OCR noise), the filter/reroute signal a
    * fixed-vocab training run needs. Emits (doc_id, n_tokens, n_oov,
    * oov_rate); docs with no non-empty tokens emit nothing. Ties at the
    * vocabulary boundary break lexically (the [[vocabCoverage]] rule),
    * so the cut is deterministic and oracle-checkable.
    *
    * Scale shape: two corpus passes by construction (the vocabulary
    * must exist before membership can be tested) — a map-side-combined
    * census collapsed to a vocabSize TakeOrdered heap, then one
    * tokenize+BROADCAST-join pass (the vocab is bounded by `vocabSize`,
    * never corpus-sized) with the per-doc aggregate on the same
    * generate; raw text never shuffles in either pass. */
  def oovRate(docs: DataFrame, idCol: String, text: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    def toks(df: DataFrame) = df
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(text)).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks(docs)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"), lit(1).as("__iv"))
    toks(docs)
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("oov_rate"))
  }

  /** Embedding-cluster topic datasheet (X139) — the "data map" pass of
    * corpus exploration (k-means over embeddings, each cluster profiled
    * by the TEXT of its members): per cluster, population, token total,
    * dominant source, and the top terms by frequency — the
    * human-readable row that tells a curator what a cluster IS before
    * they weight, cap, or drop it in the mixture.
    *
    * `assign` is any (id, cluster) frame — [[graft.operators.Ann
    * .ivfAssign]] renamed, a stored index's sidecar, or an external
    * labeling — so the datasheet composes with every clustering this
    * engine produces. Ties are pinned: dominant source by (count DESC,
    * source ASC), terms by (tf DESC, term ASC), so the row is
    * deterministic and oracle-checkable.
    *
    * Scale shape: one id-keyed join moves (source, tokens) next to the
    * cluster label; term counts are one (cluster, term) hash aggregate
    * with map-side partials; the per-cluster top-k is a rank-filtered
    * window (WindowGroupLimit pushes the cut below the shuffle), and
    * everything after is cluster-cardinality-sized. Token arrays never
    * shuffle twice: source/population stats aggregate per (cluster,
    * source) first — cluster×source partials, not doc rows. */
  def clusterDatasheet(docs: DataFrame, idCol: String, text: Column,
      source: Column, assign: DataFrame, topTerms: Int = 5): DataFrame = {
    require(topTerms >= 1, s"topTerms must be >= 1, got $topTerms")
    require(assign.columns.toSeq.sorted == Seq("cluster", "id"),
      s"assign must be an (id, cluster) frame, got ${assign.columns.toSeq}")
    import org.apache.spark.sql.expressions.Window
    val joined = docs
      .select(col(idCol).as("id"), source.as("__src"),
        TextAnalysis.tokens(text).as("__toks"))
      .join(assign, Seq("id"))
    val srcCnt = joined.groupBy(col("cluster"), col("__src"))
      .agg(count(lit(1)).as("__n"),
        sum(size(col("__toks")).cast(LongType)).as("__tok"))
    val stats = srcCnt.groupBy(col("cluster"))
      .agg(sum(col("__n")).as("n_docs"), sum(col("__tok")).as("n_tokens"))
    val topSrc = srcCnt
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(col("__n").desc, col("__src").asc)))
      .filter(col("__r") === 1)
      .select(col("cluster"), col("__src").as("top_source"))
    val top = joined
      .select(col("cluster"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("cluster"), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(col("tf").desc, col("term").asc)))
      .filter(col("__r") <= topTerms)
      .groupBy(col("cluster"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__r"), col("term")))),
        s => s.getField("term")), " ").as("top_terms"))
    stats.join(topSrc, Seq("cluster")).join(top, Seq("cluster"))
      .select(col("cluster"), col("n_docs"), col("n_tokens"),
        col("top_source"), col("top_terms"))
  }
}
