package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for training-data pipelines: corpus-derived
  * quality scoring, per-source caps, and deterministic shard shuffling.
  * Engine-side extensions beyond the reference (which has no curation
  * surface); all semantics chosen deterministic and cross-engine
  * reproducible (md5 keys, exact integer/decimal accumulation, one final
  * double division) so the DuckDB oracle verifies them bit-for-bit.
  */
object Curation {

  /** Unigram corpus-frequency score per document: the average corpus
    * probability of the document's tokens,
    * `score = (Σ_t tf(d,t)·ctf(t)) / (|d| · T)` where `ctf` is the corpus
    * term frequency and `T` the corpus token total. A cheap unigram-LM
    * stand-in: boilerplate and natural prose score high, gibberish and
    * rare-token noise score low — a standard quality-filter input.
    *
    * Shape at scale: explode to postings, hash-agg tf per (doc, term)
    * (map-side combine), second agg by term for ctf, join back on term.
    * The vocabulary grows with the corpus, so the tf–ctf join shuffles by
    * default (same reasoning as [[TextAnalysis.tfidfTopTerms]]); the
    * corpus total rides in via a broadcast single-row cross join — no
    * driver-side action. The per-doc Σ tf·ctf accumulates in
    * DECIMAL(38,0): at web scale tf·ctf reaches ~1e16 and a Long sum
    * would overflow (ANSI mode aborts the job); the decimal sum is exact
    * to 1e38. The only floating-point step is the single final division,
    * identical in any IEEE engine.
    */
  def corpusFreqScore(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    // no pre-repartition: the partial (doc, term) hash-agg must sit BELOW
    // the exchange so the shuffle carries combined tf rows, not raw token
    // occurrences; the ctf branch reuses the same canonical exchange
    val tf = TextAnalysis.postings(docs, idCol, text)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val total = ctf.agg(sum(col("ctf")).as("t"))
    val dec = DataTypes.createDecimalType(38, 0)
    tf.join(ctf, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast(LongType).as("n_tokens"),
        sum((col("tf") * col("ctf")).cast(dec)).as("sum_ctf"))
      .crossJoin(broadcast(total))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("sum_ctf").cast(DoubleType) /
          (col("n_tokens").cast(DoubleType) * col("t").cast(DoubleType)), 6)
          .as("lm_score"))
  }

  /** Keep at most `n` rows per key, picked in `order` order — the standard
    * per-domain/per-source cap that stops any single site from dominating
    * a crawl corpus. Emits the kept rows plus their `rn` rank.
    *
    * Scale shape: one shuffle on the key; Spark's WindowGroupLimit rule
    * pushes the `row_number <= n` cut below the window sort, so each
    * partition keeps only n rows per key before the exchange-side sort —
    * no full per-key sort materializes (asserted in the plan audit).
    *
    * `order` must be a TOTAL order within each key (e.g. end in a unique
    * id): `row_number` breaks ties in partition-iteration order, so a
    * partial order would keep a different subset on rerun/retry and
    * diverge from any oracle.
    */
  def capPerKey(df: DataFrame, key: Column, n: Int, order: Column*): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    require(order.nonEmpty, "capPerKey needs at least one order column")
    require(!df.columns.contains("rn"),
      "capPerKey emits an 'rn' column; rename the existing one first")
    df.withColumn("rn",
        row_number().over(Window.partitionBy(key).orderBy(order: _*)).cast(IntegerType))
      .filter(col("rn") <= n)
  }

  /** Bounded deterministic sample (the ES `sampler` aggregation):
    * the top `shardSize` rows under `order` — child aggregations then
    * run over this sample instead of the full corpus (ES built it to
    * bound expensive sub-aggs like significant_terms; it is equally a
    * curation primitive — bounded exploration of a corpus slice
    * before committing to a full pass). ES samples per shard by score;
    * a deterministic, oracle-gated engine samples by an explicit TOTAL
    * order — end it in a unique id, the [[capPerKey]] rule, or reruns
    * keep a different subset. Plans as ONE TakeOrderedAndProject heap
    * (each task keeps `shardSize` rows, the driver merges) — never a
    * global sort of the corpus. */
  def samplerAgg(df: DataFrame, shardSize: Int, order: Column*): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    require(order.nonEmpty, "samplerAgg needs at least one order column")
    df.orderBy(order: _*).limit(shardSize)
  }

  /** Diversified bounded sample (the ES `diversified_sampler` agg):
    * [[samplerAgg]] with a per-`field` cap — at most `maxDocsPerValue`
    * rows per field value may enter the sample, so one dominant key (a
    * crawl domain, a boilerplate template, a language) cannot
    * monopolize the exploration budget — ES's de-bias knob, and
    * exactly the dedup-by-field bounded sampling a curation pass wants.
    * Composition, per the ES semantics (the per-key cut happens BEFORE
    * the size cut): [[capPerKey]]'s window-limited per-key top
    * `maxDocsPerValue` (one shuffle on the field, the WindowGroupLimit
    * push keeps per-task state at n rows per key), then the
    * [[samplerAgg]] heap over the survivors. `order` must be a total
    * order; it drives BOTH cuts, as in ES (one `max_docs_per_value`,
    * one score). */
  def diversifiedSampler(df: DataFrame, field: Column, maxDocsPerValue: Int,
      shardSize: Int, order: Column*): DataFrame = {
    require(maxDocsPerValue > 0,
      s"maxDocsPerValue must be positive, got $maxDocsPerValue")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    require(order.nonEmpty, "diversifiedSampler needs at least one order column")
    capPerKey(df, field, maxDocsPerValue, order: _*).drop("rn")
      .orderBy(order: _*).limit(shardSize)
  }

  /** Balance a keyed corpus to a uniform mixture: compute per-key
    * sampling rates so every key contributes ~the same total `size` mass
    * as the SMALLEST key, then hash-gate rows at those rates
    * ([[graft.util.Sampling.hashBucket]] — deterministic, rand()-free,
    * auditable). The data-driven sibling of
    * [[graft.util.Sampling.stratifiedHashSample]]'s static rates: this is
    * the "don't let one crawl dominate the mixture" step of corpus
    * assembly.
    *
    * Rates quantize to `floor(frac · 10000)` buckets, so a key more than
    * 10000× the smallest key's mass rounds to rate 0 and contributes
    * nothing — under such extreme skew pick explicit rates instead.
    *
    * Scale shape: the per-key rate table is one row per key — broadcast
    * when keys are sources/languages (thousands); set
    * `broadcastRates = false` for per-domain balancing (millions of
    * keys), which plans a shuffle join on the key instead. */
  def balancedSample(docs: DataFrame, key: Column, id: Column, size: Column,
      salt: String = "", broadcastRates: Boolean = true): DataFrame = {
    Seq("__k", "__mass", "__thr").foreach(c =>
      require(!docs.columns.contains(c),
        s"balancedSample uses '$c' internally; rename the existing column first"))
    // null keys form their own group (same convention as
    // Sampling.hashBucket: a null key must get a deterministic decision,
    // not a silent equi-join drop); zero-mass keys are excluded BEFORE the
    // min — they contribute nothing either way, and letting them set
    // min=0 would zero every rate (and 0/0 -> NaN for themselves)
    val kNorm = coalesce(key.cast(StringType), lit(""))
    val perKey = docs.groupBy(kNorm.as("__k"))
      .agg(sum(size.cast(LongType)).as("__mass"))
      .filter(col("__mass") > 0L)
    val minMass = perKey.agg(min(col("__mass")).as("__min"))
    val rates = perKey.crossJoin(broadcast(minMass))
      .select(col("__k"),
        floor(col("__min").cast(DoubleType) / col("__mass").cast(DoubleType)
          * graft.util.Sampling.Buckets).cast(LongType).as("__thr"))
    docs
      .join(if (broadcastRates) broadcast(rates) else rates, kNorm === col("__k"))
      .filter(graft.util.Sampling.hashBucket(id, salt) < col("__thr"))
      .drop("__k", "__thr")
  }

  /** Deterministic training-data shuffle: an md5 shuffle key over
    * (id, seed) assigns each row a shard in [0, nShards) and a stable
    * pseudo-random order within the shard. Re-running with the same seed
    * reproduces the exact epoch order — `rand()` cannot (task retries
    * resample it); changing the seed gives an independent permutation.
    *
    * The returned frame carries (shuffle_key, shard); writers should
    * `.repartition(nShards, $"shard").sortWithinPartitions($"shuffle_key")`
    * so each output shard file is internally shuffled with no global sort.
    * The first 15 hex chars of the md5 (60 bits) convert exactly to a
    * Long — 16 would not (64 bits can overflow the signed range under
    * ANSI).
    */
  /** Gopher-style quality gate (Rae et al. 2021, arXiv:2112.11446,
    * Table A1 family): ordered cheap rejection rules over per-row signals;
    * emits EVERY document with its verdict and the FIRST failing rule as
    * `reason` (NULL = kept). Keeping the reason makes the gate auditable —
    * at 100 TB you tune thresholds from the reason histogram, not by
    * re-running the corpus. Pure per-row Column compositions: no shuffle,
    * codegen'd, fused into whatever scan precedes it.
    *
    * Rules, first hit wins: token count outside [minTokens, maxTokens];
    * mean word length outside [minAvgWordLen, maxAvgWordLen]; duplicate
    * n-gram fraction above maxDupNgramFrac (the [[TextAnalysis
    * .repetitionSignals]] dup_ngram_frac); fewer than minStopwords
    * DISTINCT English stopwords (closed-class hits are the cheapest
    * natural-language-ness test). */
  def gopherGate(docs: DataFrame, idCol: String, text: Column,
      minTokens: Int = 20, maxTokens: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      maxDupNgramFrac: Double = 0.05, minStopwords: Int = 2,
      ngramN: Int = 3): DataFrame = {
    // staged projections (the Dedup/TextAnalysis codegen invariant): the
    // token and shingle arrays are materialized once and every rule reads
    // the staged column — an inline tokens(text) under each rule would
    // re-split the text per rule evaluation
    val staged = docs
      .select(col(idCol), TextAnalysis.tokens(text).as("__toks"))
      .withColumn("__sh", TextAnalysis.shinglesFromTokens(col("__toks"), ngramN))
      .withColumn("__nt", size(col("__toks")))
    // Gopher's mean-characters-per-WORD: sum of token lengths over token
    // count (raw text length would inflate it ~1 char/token via the
    // separators — the Rae et al. Table A1 thresholds assume word chars)
    val atl = aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType) / greatest(col("__nt"), lit(1)).cast(DoubleType)
    val nsh = size(col("__sh"))
    val dupFrac = when(nsh === 0, lit(0.0))
      .otherwise((nsh - size(array_distinct(col("__sh")))).cast(DoubleType) /
        nsh.cast(DoubleType))
    val swDistinct = size(filter(array_distinct(col("__toks")),
      t => t.isin(TextAnalysis.stopwords("en"): _*)))
    val reason = when(col("__nt") < minTokens, "too_short")
      .when(col("__nt") > maxTokens, "too_long")
      .when(atl < minAvgWordLen, "word_len_low")
      .when(atl > maxAvgWordLen, "word_len_high")
      .when(dupFrac > maxDupNgramFrac, "repetition")
      .when(swDistinct < minStopwords, "few_stopwords")
    staged
      .withColumn("reason", reason)
      .select(col(idCol), col("__nt").cast(LongType).as("n_tokens"),
        col("reason").isNull.as("keep"), col("reason"))
  }

  /** Adaptive quality cutoff: keep the top `keepFrac` of the corpus by
    * [[TextAnalysis.qualityScore]] — the data-driven form of
    * [[gopherGate]]'s fixed thresholds. A fixed score cutoff rots as the
    * crawl mix drifts; a percentile cutoff tracks the distribution
    * (reject-the-worst-decile survives a quality regression upstream).
    * Emits the kept rows with their score plus the cutoff used — the
    * audit trail a reproducible pipeline records next to the output.
    *
    * Scale shape: one exact-percentile aggregate rides back as a
    * broadcast single-row cross join (the scalar-anchor pattern — no
    * driver action), then a shuffle-free filter pass. At 100 TB pass
    * `approx = true`: `percentile_approx` (GK sketch, rank error <=
    * n/accuracy) replaces the exact sort-based percentile — identical
    * plan shape, the [[CorpusStats.lengthStats]] exact/sketch duality;
    * the kept fraction then deviates from keepFrac by at most the rank
    * error (suite-pinned). */
  def adaptiveQualityCutoff(docs: DataFrame, idCol: String, text: Column,
      keepFrac: Double = 0.9, approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, s"keepFrac must be in (0,1], got $keepFrac")
    val scored = docs.select(col(idCol), TextAnalysis.qualityScore(text).as("score"))
    val cutAgg =
      if (approx) percentile_approx(col("score"), lit(1.0 - keepFrac), lit(accuracy))
      else percentile(col("score"), lit(1.0 - keepFrac))
    val cut = scored.agg(cutAgg.as("__cut"))
    scored.crossJoin(broadcast(cut))
      .filter(col("score") >= col("__cut"))
      .select(col(idCol), col("score"), round(col("__cut"), 6).as("cutoff"))
  }

  /** Token-budget mixture sampling — the static data-mixing pass of a
    * Pile/DoReMi-style pipeline: each source is given an explicit token
    * budget and contributes documents, in a deterministic md5-shuffled
    * order, until its budget is spent. Sources absent from `budgets` are
    * dropped entirely — the mixture DECLARES what the training set
    * contains. Keep rule: a document is kept iff its INCLUSIVE running
    * token sum fits the budget — the first over-budget document is cut
    * whole, never truncated (truncation belongs to
    * [[graft.operators.Packing]], after mixing).
    *
    * Emits the kept rows as `(id, source, tokens, cum_tokens)`.
    *
    * Scale shape: one window per source over (md5 shuffle key, id) — a
    * single exchange keyed by source; the budget table rides along as a
    * literal MapType expression (no join at all). The per-source sort is
    * the same scan order every epoch and every engine (md5, not `rand()`,
    * which task retries resample — the [[shardShuffle]] argument). A
    * mega-source makes a hot window partition: pre-cap it with
    * [[capPerKey]] or split its budget across salted sub-sources. */
  def mixtureSample(docs: DataFrame, source: Column, idCol: String,
      tokensCol: Column, budgets: Seq[(String, Long)], seed: String = ""): DataFrame = {
    require(budgets.nonEmpty, "mixtureSample needs at least one source budget")
    require(!Seq("source", "tokens", "cum_tokens", "__sk").contains(idCol),
      s"mixtureSample emits source/tokens/cum_tokens; id column '$idCol' collides")
    val budgetMap = map(budgets.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val w = Window.partitionBy(col("source")).orderBy(col("__sk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .filter(source.isin(budgets.map(_._1): _*))
      .select(col(idCol), source.as("source"), tokensCol.cast(LongType).as("tokens"))
      .withColumn("__sk", md5(concat(col(idCol).cast(StringType), lit(":"), lit(seed))))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .filter(col("cum_tokens") <= element_at(budgetMap, col("source")))
      .drop("__sk")
  }

  def shardShuffle(df: DataFrame, idCol: String, nShards: Int, seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shuffle_key") && !df.columns.contains("shard"),
      "shardShuffle emits 'shuffle_key' and 'shard' columns; rename existing ones first")
    val key = md5(concat(col(idCol).cast(StringType), lit(":"), lit(seed)))
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 15), 16, 10).cast(LongType),
          lit(nShards.toLong)).cast(IntegerType))
  }

  /** DSIR-style importance weights (Xie et al. 2302.03169 resample raw
    * data toward a target distribution by n-gram likelihood ratio): per
    * document, `weight = xent_background - xent_target` — the mean
    * per-bigram log-likelihood ratio log P_target(x) - log P_raw(x) of
    * [[TextAnalysis.lmScore]]'s add-alpha bigram models, one counted from
    * `targetDocs` (the distribution to select FOR, e.g. a trusted
    * high-quality subset) and one from `docs` itself. Positive = more
    * target-like than the raw corpus; downstream, sample proportional to
    * exp(weight·n_bigrams) or keep the top fraction.
    *
    * Fused single pass: ONE scored-side bigram generate joined against
    * both vocabulary-sized count tables, both per-doc means in the same
    * aggregation — not two [[TextAnalysis.lmScore]] calls back to back
    * (which would generate and aggregate the 100 TB side twice). The
    * composition equivalence is unit-tested. Docs with fewer than 2
    * non-empty tokens have no bigrams and are omitted; determinism is the
    * lmScore discipline (round per-bigram, exact decimal sum, one
    * division, subtraction of two already-rounded doubles).
    *
    * The two pinned count tables live as long as the returned frame: in a
    * long-lived session, `graft.util.Pins.release(result)` after the last
    * consumer has materialized (see [[graft.util.Pins]]). */
  def dsirWeights(docs: DataFrame, targetDocs: DataFrame, idCol: String,
      text: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // each model's vocabulary-sized count table is pinned eagerly so its
    // three consumers (count join, head aggregate, V aggregate) share ONE
    // reference-corpus pass; V rides in as a broadcast single-row cross
    // join — no driver-side action (see [[TextAnalysis.lmScore]])
    def model(ref: DataFrame, pfx: String) = {
      val bg = TextAnalysis.bigramPairs(ref, idCol, text)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as(pfx + "c2"))
        .localCheckpoint(true)
      val heads = bg.groupBy(col("w1")).agg(sum(col(pfx + "c2")).as(pfx + "c1"))
      val vRow = bg.agg(countDistinct(col("w2")).as(pfx + "v"))
      (bg, heads, vRow)
    }
    val (tb, th, tv) = model(targetDocs, "t")
    val (bb, bh, bv) = model(docs, "b")
    def lp(c2: Column, c1: Column, v: Column) = round(-log(
      (coalesce(c2, lit(0L)).cast(DoubleType) + lit(alpha)) /
        (coalesce(c1, lit(0L)).cast(DoubleType) + lit(alpha) * v.cast(DoubleType))), 6)
    val dec = DataTypes.createDecimalType(38, 6)
    TextAnalysis.bigramPairs(docs, idCol, text)
      .join(tb, Seq("w1", "w2"), "left")
      .join(th, Seq("w1"), "left")
      .join(bb, Seq("w1", "w2"), "left")
      .join(bh, Seq("w1"), "left")
      .crossJoin(broadcast(tv))
      .crossJoin(broadcast(bv))
      .withColumn("__lpt", lp(col("tc2"), col("tc1"), col("tv")))
      .withColumn("__lpb", lp(col("bc2"), col("bc1"), col("bv")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__lpt").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("xent_target"),
        round(sum(col("__lpb").cast(dec)).cast(DoubleType) / count(lit(1)), 6)
          .as("xent_background"))
      .withColumn("weight", round(col("xent_background") - col("xent_target"), 6))
      .withColumnRenamed("doc_id", idCol)
  }

  /** Priority sampling (Duffield-Lund-Thorup, JACM '07): a deterministic
    * weight-proportional sample WITHOUT replacement — the curation move
    * "keep k documents, favoring high quality/length weights, reproducibly
    * across reruns and engines". Each row gets priority `q = w / u` with
    * `u` a seeded md5-uniform in (0, 1]; the sample is the top-k by
    * (q desc, id) — heavy rows are near-certain members, light rows enter
    * with probability ~ proportional to weight.
    *
    * Engine-portable determinism: `u = (h + 1) / 2^52` from the first 13
    * md5 hex chars is an exact dyadic rational, and `q` is two IEEE
    * divisions — NO transcendental anywhere (the Efraimidis-Spirakis
    * `u^(1/w)` form would put `pow`/`ln` ulp noise right at the top-k
    * boundary). Identical doubles in any engine, total order via the id
    * tie-break.
    *
    * Scale shape: per-row map + one TakeOrderedAndProject — the
    * distributed top-k heap, no global sort, no shuffle of the corpus.
    * Rows with non-positive weight are excluded (their inclusion
    * probability is 0). */
  def prioritySample(df: DataFrame, idCol: String, weight: Column, k: Int,
      seed: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = conv(substring(md5(concat(col(idCol).cast(StringType), lit(":"), lit(seed))),
      1, 13), 16, 10).cast(LongType)
    val u = (h.cast(DoubleType) + lit(1.0)) / lit(4503599627370496.0) // 2^52
    df.withColumn("__w", weight.cast(DoubleType))
      .filter(col("__w") > 0)
      .withColumn("priority", col("__w") / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("__w").as("weight"), round(col("priority"), 6).as("priority"))
  }

  /** CCNet's head/middle/tail corpus partitioning (Wenzek 1911.00359 §4.3:
    * each language split into three equal perplexity buckets; head feeds
    * the highest-quality training mix): per `group` (typically language),
    * rank documents by [[TextAnalysis.lmScore]] perplexity and cut into
    * terciles — `head` = lowest perplexity (most reference-like).
    *
    * Buckets are rank-based (NTILE over a TOTAL order: ppl, then id as the
    * tie-break), not threshold-based — deterministic and engine-portable
    * where a percentile threshold would hang bucket membership on floating
    * boundary comparisons. Sizes per group differ by at most one doc,
    * earlier buckets take the extras (standard NTILE in Spark and ANSI
    * SQL alike).
    *
    * Scale: the per-group window sorts each group once — the same
    * full-sort CCNet itself pays per language. For a quick split without
    * the sort, anchor thresholds via approx_percentile over `xent` (the
    * [[adaptiveQualityCutoff]] shape) and accept epsilon-boundary drift.
    * Output: `grp`, the [[TextAnalysis.lmScore]] columns, and `bucket`. */
  /** Compression-ratio quality signal (X106): `deflate(text)/|text|` per
    * document — the classic cheap boilerplate/repetition detector
    * (templated and machine-generated text compresses far below organic
    * prose; used as a filter signal in CCNet-descendant pipelines). Low
    * ratio ⇒ repetitive; ratios near (or above) 1 ⇒ high-entropy text or
    * already-compressed noise. Complements [[gopherGate]]'s n-gram rules
    * with a whole-document redundancy measure they can't see.
    *
    * Implemented with `mapPartitions` — DEFLATE is not expressible in
    * Catalyst — with one `Deflater` per partition (reset per row, freed
    * on task completion). Deterministic for a fixed JVM zlib; there is
    * no DuckDB deflate, so this operator has NO oracle entry: the driver
    * records a rows-only check and the unit suite pins monotonicity
    * (repetitive < organic < random) and exact byte accounting. */
  def deflateRatio(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("n_deflate", LongType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    docs.select(col(idCol).try_cast(LongType).as("doc_id"),
        coalesce(text, lit("")).as("__t"))
      // same one-bad-row discipline as the text coalesce above: a null or
      // malformed id must not kill the task (ANSI cast throws, try_cast
      // nulls) — drop it before the partition walk, the scan survives
      .filter(col("doc_id").isNotNull)
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](8192)
        rows.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var total = 0L
          while (!deflater.finished()) total += deflater.deflate(buf)
          val ratio =
            if (bytes.isEmpty) 1.0
            else BigDecimal.valueOf(total.toDouble / bytes.length)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(r.getLong(0), bytes.length.toLong, total, ratio)
        }
      }(enc)
  }

  /** Mixture planner (X102): given target mixture WEIGHTS and a token
    * budget, compute each source's token target and the per-source keep
    * RATE that realizes it — the planning step between "we want 60/30/10"
    * and the [[graft.util.Sampling.stratifiedHashSample]] rates that
    * enforce it. `rate = min(1, target_tokens / available_tokens)`: a
    * source with less material than its slot keeps everything (`deficit`
    * says how many tokens the slot is short — reallocate or shrink the
    * budget); sources outside `targets` are dropped (the mixture DECLARES
    * the training set, the [[mixtureSample]] rule).
    *
    * Deterministic: one exact count/sum aggregate per source, integer
    * token targets via round(share·budget), rates as double ratios
    * rounded 6. Scale shape: one map-side-combined aggregate collapses
    * the corpus to ≤|sources| rows; the targets ride as a broadcast
    * VALUES frame — nothing corpus-sized shuffles. */
  def mixturePlan(docs: DataFrame, source: Column, tokensCol: Column,
      targets: Seq[(String, Double)], totalBudget: Long): DataFrame = {
    require(targets.nonEmpty, "need at least one target share")
    targets.foreach { case (s, w) =>
      require(w > 0.0 && w <= 1.0, s"share for '$s' must be in (0,1], got $w") }
    require(math.abs(targets.map(_._2).sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targets.map(_._2).sum}")
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    val avail = docs.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).cast(LongType).as("tokens_avail"))
    val spark = docs.sparkSession
    import spark.implicits._
    val want = targets.toDF("source", "target_share")
    avail.join(broadcast(want), Seq("source"))
      .withColumn("tokens_target",
        round(col("target_share") * totalBudget).cast(LongType))
      .select(col("source"), col("n_docs"), col("tokens_avail"),
        round(col("target_share"), 6).as("target_share"), col("tokens_target"),
        round(least(lit(1.0), col("tokens_target").cast(DoubleType) /
          col("tokens_avail").cast(DoubleType)), 6).as("rate"),
        greatest(lit(0L), col("tokens_target") - col("tokens_avail")).as("deficit"))
  }

  /** UniMax budget allocation (X150; Chung et al., "UniMax: Fairer and
    * More Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023, arXiv 2304.09151): split a total token
    * budget across sources as UNIFORMLY as possible, capping every
    * source at `maxEpochs` passes over its material — the
    * repetition-bounded alternative to [[mixturePlan]]'s declared shares
    * (and the Muennighoff 2305.16264 finding that ≳4 epochs of repeats
    * stop helping made the epoch cap the standard mixture control).
    *
    * UniMax's greedy loop (ascending by capacity, each source takes
    * `min(cap, remaining/remaining_sources)`) equals the classic
    * waterfilling closed form, which is what this computes: with sources
    * sorted ascending by `cap = maxEpochs·tokens_avail`, the uniform
    * level only RISES as capped sources drop out, so the capped set is a
    * prefix of the sort order and each row decides itself locally —
    * `capped ⇔ cap·n_remaining ≤ budget − prefix_cap_sum`. Uncapped
    * sources all land on one water level
    * `(budget − Σ capped caps) / n_uncapped`. `budget_left` > 0 (same
    * scalar on every row) means total capacity under the cap cannot
    * absorb the budget — raise `maxEpochs` or add data.
    *
    * Determinism: caps and prefix sums are exact Long arithmetic
    * (overflow-safe to ~1e18 token-epochs — beyond any corpus), ties
    * order by (cap, source), the water level is the single double
    * division, outputs round-6. Scale shape: one map-side-combined
    * aggregate collapses the corpus to ≤|sources| rows; the windows run
    * on that BOUNDED side frame (the [[mixtureDrift]] justification —
    * |sources| is config-sized, not corpus-sized), corpus rows never
    * shuffle. */
  def uniMaxPlan(docs: DataFrame, source: Column, tokensCol: Column,
      totalBudget: Long, maxEpochs: Int): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val per = docs.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol).cast(LongType).as("tokens_avail"))
      .withColumn("cap_tokens", col("tokens_avail") * maxEpochs)
    val ord = Window.orderBy(col("cap_tokens"), col("source"))
    val all = Window.partitionBy(lit(1))
    val staged = per
      .withColumn("__prefix", coalesce(sum(col("cap_tokens"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__r", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(all))
      .withColumn("capped",
        col("cap_tokens") * (col("__n") - col("__r") + lit(1L)) <=
          lit(totalBudget) - col("__prefix"))
    val leveled = staged
      .withColumn("__capped_sum", coalesce(
        sum(when(col("capped"), col("cap_tokens"))).over(all), lit(0L)))
      .withColumn("__n_uncapped",
        col("__n") - sum(when(col("capped"), 1L).otherwise(0L)).over(all))
      .withColumn("__level",
        // guarded: with every source capped there is no water level (ANSI
        // div-by-zero otherwise) — the capped branch below never reads it
        when(col("__n_uncapped") > 0,
          (lit(totalBudget) - col("__capped_sum")).cast(DoubleType) /
            col("__n_uncapped").cast(DoubleType)))
    leveled.select(col("source"), col("n_docs"), col("tokens_avail"),
      col("cap_tokens"), col("capped"),
      round(when(col("capped"), col("cap_tokens").cast(DoubleType))
        .otherwise(col("__level")), 6).as("alloc_tokens"),
      when(col("tokens_avail") > 0, round(
        when(col("capped"), col("cap_tokens").cast(DoubleType))
          .otherwise(col("__level")) /
        col("tokens_avail").cast(DoubleType), 6)).as("epochs"),
      when(col("__n_uncapped") === 0,
        lit(totalBudget) - col("__capped_sum")).otherwise(lit(0L))
        .as("budget_left"))
  }

  /** Hashed bag-of-words feature bitmask for [[qualityClassifier]]: bit
    * `j` is set iff some token of `text` hashes to `j` under the 28-bit
    * md5 bucket hash (the engine-wide [[graft.util.Sampling]] /
    * minhash idiom, so the DuckDB twin is exact). Presence, not counts —
    * the hashing-trick feature map of fastText/CCNet-style quality
    * classifiers (Joulin et al. 1607.01759; Wenzek et al. 1911.00359) at
    * the smallest useful width. Bit-OR is order-independent, so the
    * per-row array fold needs no ordering contract; no shuffle. */
  def featureMask(text: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 60,
      s"dims must be in [1,60] (bitmask packs into one Long), got $dims")
    val h = (t: Column) =>
      (conv(substring(md5(t), 1, 7), 16, 10).cast(LongType) % dims)
        .cast(IntegerType)
    coalesce(aggregate(TextAnalysis.tokens(text), lit(0L),
      (acc, t) => acc.bitwiseOR(call_function("shiftleft", lit(1L), h(t)))),
      lit(0L))
  }

  /** Trained quality classifier (X151): full-batch logistic regression
    * over [[featureMask]]'s hashed bag-of-words bits — the
    * curated-vs-crawl quality filter of GPT-3 (Brown et al. 2005.14165
    * §A) and CCNet (Wenzek et al. 1911.00359), where `label` marks the
    * curated positives (e.g. `source` membership) and the learned model
    * scores every document's "looks curated" probability. Training runs
    * HERE, distributed, and is oracle-reproducible bit-for-bit — not a
    * fixture of pretrained weights.
    *
    * Determinism by construction, the property that lets a DuckDB oracle
    * replay the whole training run: (1) per-doc logits are a FIXED
    * left-associated add chain over bit tests (identical IEEE tree in
    * both engines — never a data-ordered sum of feature weights); (2)
    * per-doc residuals quantize to 1e-6 (`round((p−y)·1e6)` as Long), so
    * gradient accumulation is an EXACT integer sum — order-independent
    * across partitions, no float-reduction nondeterminism; (3) the
    * driver's weight update `w − lr·((g/n)/1e6)` is a pinned double op
    * sequence the oracle mirrors verbatim. Init w=0,b=0. The only
    * engine-sensitive step is libm `exp`, already carried at round-6 by
    * every ppl/KL query on the board; residual quantization keeps a
    * 1-ulp `exp` divergence from compounding across iterations unless it
    * lands exactly on a 0.5e-6 boundary.
    *
    * Scale shape: ONE corpus pass builds (id, y, mask) — 17 bytes of
    * model-relevant state per doc, text never reread; that staging is
    * pinned once (eager localCheckpoint) and each of the `iters`
    * driver-sequenced rounds is one map-side-combined aggregate
    * producing dims+2 longs (a single reduce row — the gradient), the
    * driver holds only the dims+1 weights. Returned scores are BACKED by
    * the pin — callers release via [[graft.util.Pins.release]] after
    * materializing (the [[graft.operators.Dedup.dedupGroups]] contract).
    *
    * Returns (id, label, prob, pred): prob round-6, pred = prob ≥ 0.5 on
    * the ROUNDED prob (pinning the tie surface cross-engine). */
  def qualityClassifier(docs: DataFrame, idCol: String, text: Column,
      label: Column, dims: Int, iters: Int, lr: Double): DataFrame = {
    val staged = docs.select(col(idCol),
        label.cast(IntegerType).as("label"),
        featureMask(text, dims).as("__mask"))
      .localCheckpoint(true)
    val (w, b) = lrTrainStaged(staged, dims, iters, lr)
    val prob = round(lrProb(col("__mask"), w, b), 6)
    staged.select(col(idCol), col("label"), prob.as("prob"),
      (prob >= lit(0.5)).as("pred"))
  }

  /** Train [[qualityClassifier]]'s model and return just (weights, bias)
    * — the hand-off to serving paths that score WITHOUT retraining
    * ([[graft.streaming.ClassifierStream]] broadcasts these into a
    * per-micro-batch projection). Same training run bit-for-bit; the
    * internal feature pin is released before returning. */
  def lrTrain(docs: DataFrame, text: Column, label: Column,
      dims: Int, iters: Int, lr: Double): (Seq[Double], Double) = {
    val staged = docs.select(label.cast(IntegerType).as("label"),
        featureMask(text, dims).as("__mask"))
      .localCheckpoint(true)
    val out = lrTrainStaged(staged, dims, iters, lr)
    graft.util.Pins.release(staged)
    (out._1.toSeq, out._2)
  }

  /** The logistic probability of a feature mask under fixed weights —
    * ((b + t0) + t1) + ... , the FIXED left-assoc chain the oracle (and
    * any other engine) reproduces bit-for-bit; a pure per-row
    * projection, so it is streaming-safe and exchange-free. */
  def lrProb(mask: Column, weights: Seq[Double], bias: Double): Column = {
    val z = weights.indices.foldLeft(lit(bias)) { (acc, j) =>
      acc + when(shiftright(mask, j).bitwiseAND(lit(1L)) === lit(1L),
        lit(weights(j))).otherwise(lit(0.0)) }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  private def lrTrainStaged(staged: DataFrame, dims: Int, iters: Int,
      lr: Double): (Array[Double], Double) = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1,100], got $iters")
    require(lr > 0.0, s"lr must be positive, got $lr")
    val w = Array.fill(dims)(0.0)
    var b = 0.0
    def bit(j: Int) =
      shiftright(col("__mask"), j).bitwiseAND(lit(1L)) === lit(1L)
    for (_ <- 1 to iters) {
      val p = lrProb(col("__mask"), w.toSeq, b)
      val ri = round((p - col("label")) * lit(1000000.0)).cast(LongType)
      val aggs = (0 until dims).map(j =>
        sum(when(bit(j), ri).otherwise(lit(0L))).as(s"g$j")) ++
        Seq(sum(ri).as("gb"), count(lit(1)).as("n"))
      val row = staged.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(dims + 1).toDouble
      var j = 0
      while (j < dims) {
        w(j) = w(j) - lr * (row.getLong(j).toDouble / n / 1000000.0); j += 1 }
      b = b - lr * (row.getLong(dims).toDouble / n / 1000000.0)
    }
    (w, b)
  }

  /** Classifier calibration curve + ECE terms (X152; reliability diagram
    * of Guo et al. 1706.04599 §2): equal-width probability bins over a
    * scored frame (e.g. [[qualityClassifier]] output), per bin the count,
    * mean predicted probability (confidence), empirical positive rate
    * (accuracy), their gap, and the bin's Expected Calibration Error
    * term `(n/N)·|gap|` — sum `ece_term` for ECE (the [[mixtureDrift]]
    * reader-sums convention). The diagnostic read before TRUSTING a
    * quality filter's threshold: a miscalibrated classifier at cut 0.5
    * silently shifts the corpus mixture.
    *
    * Determinism: bin = clamped `floor(prob·bins)` (pure IEEE, identical
    * cross-engine); confidence accumulates round-6 probs in
    * DECIMAL(38,6) (exact, order-independent — the [[dsirWeights]]
    * discipline); rates/gaps round-6 with the gap computed FROM the
    * rounded columns (pinned tie surface). Scale shape: one map-side-
    * combined aggregate collapses the corpus to ≤bins rows; the total
    * rides back as one broadcast row. Returns
    * (bin, n, mean_prob, pos_rate, gap, ece_term). */
  def calibrationCurve(scored: DataFrame, prob: Column, label: Column,
      bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 1000, s"bins must be in [1,1000], got $bins")
    val dec = DataTypes.createDecimalType(38, 6)
    val base = scored.select(prob.cast(DoubleType).as("p"),
      label.cast(IntegerType).as("y"))
    val binned = base.withColumn("bin",
      greatest(lit(0), least(lit(bins - 1), floor(col("p") * bins)))
        .cast(IntegerType))
    val tot = binned.agg(count(lit(1)).as("nt"))
    val agg = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      round(sum(round(col("p"), 6).cast(dec)).cast(DoubleType) /
        count(lit(1)), 6).as("mean_prob"),
      round(sum(col("y")).cast(DoubleType) / count(lit(1)), 6).as("pos_rate"))
    agg.crossJoin(broadcast(tot))
      .withColumn("gap", round(col("pos_rate") - col("mean_prob"), 6))
      .select(col("bin"), col("n"), col("mean_prob"), col("pos_rate"),
        col("gap"),
        round(col("n").cast(DoubleType) / col("nt") * abs(col("gap")), 6)
          .as("ece_term"))
  }

  /** Multi-epoch training-order materialization (X159): turn a per-source
    * epoch allocation — [[uniMaxPlan]]'s `epochs` column, or any policy —
    * into the ACTUAL sequence a trainer consumes: each source appears
    * `floor(e)` full passes plus one FRACTIONAL pass keeping `e−floor(e)`
    * of its documents (deterministic md5-bucket sampling, salted by epoch
    * so each partial pass draws its own subset), every epoch reshuffled
    * by an epoch-salted md5 key ([[curriculumOrder]]'s convention), and
    * the whole schedule given one dense global `order_idx` in
    * (epoch, shuffle_key, id) order. Sources absent from the plan are
    * dropped — the plan DECLARES the training set (the [[mixtureSample]]
    * rule).
    *
    * Doc-level sampling approximates the token fraction (unbiased when
    * length and source are independent; a token-exact cut is
    * [[mixtureSample]]'s greedy fill). Determinism: the keep decision is
    * the [[graft.util.Sampling.hashBucket]] 28-bit md5 rate, thresholds
    * round-half-up at 1e-4; epochs per source capped at 50 (a repetition
    * count past the Muennighoff 2305.16264 useful range is a config
    * bug). Scale shape: plan broadcasts as a VALUES frame, the explode
    * fans each doc to ≤⌈e⌉ light rows (id, source, epoch), the dense
    * index is [[graft.util.DenseIds]]'s range-partition + zipWithIndex
    * scheme — no single-partition window, text never read. */
  def epochSchedule(docs: DataFrame, idCol: String, source: Column,
      epochsBySource: Seq[(String, Double)], seed: String): DataFrame = {
    require(epochsBySource.nonEmpty, "need at least one source allocation")
    require(epochsBySource.map(_._1).distinct.size == epochsBySource.size,
      "duplicate source in the allocation")
    epochsBySource.foreach { case (s, e) =>
      require(e > 0.0 && e <= 50.0, s"epochs for '$s' must be in (0,50], got $e") }
    require(seed.nonEmpty, "seed must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val plan = epochsBySource.toDF("source", "epochs")
    val joined = docs.select(col(idCol).as("id"), source.as("source"))
      .join(broadcast(plan), Seq("source"))
    val fanned = joined.select(col("id"), col("source"), col("epochs"),
      explode(sequence(lit(1L), ceil(col("epochs")).cast(LongType))).as("__e"))
      .withColumn("epoch", col("__e").cast(IntegerType)).drop("__e")
    val fracBucket = pmod(conv(substring(md5(concat(
        lit(s"$seed:"), col("epoch").cast(StringType), lit(":"),
        col("id").cast(StringType))), 1, 7), 16, 10).cast(LongType),
      lit(graft.util.Sampling.Buckets))
    val fracRate = round((col("epochs") - floor(col("epochs"))) *
      graft.util.Sampling.Buckets).cast(LongType)
    val kept = fanned.filter(
      col("epoch") <= floor(col("epochs")) || fracBucket < fracRate)
    val keyed = kept.select(col("id"), col("source"), col("epoch"),
      md5(concat(col("id").cast(StringType), lit(s":$seed:"),
        col("epoch").cast(StringType))).as("shuffle_key"))
    graft.util.DenseIds.assign(keyed, "order_idx", 0L,
      col("epoch"), col("shuffle_key"), col("id"))
  }

  /** Mixture drift between two corpus snapshots (X89): per-source share
    * shift plus each source's KL(new‖old) and Jensen–Shannon terms — the
    * drift alarm a recurring crawl runs BEFORE training on a new cut.
    * [[graft.operators.Dedup.snapshotDiff]] diffs MEMBERSHIP; this diffs
    * the MIXTURE — a crawl can keep every document and still silently
    * shift the source distribution the training run was tuned for. Sum
    * `kl_term` for total KL(new‖old), `js_term` for total JS (symmetric,
    * bounded by ln 2 — the alarm threshold that doesn't blow up when a
    * source vanishes).
    *
    * Laplace-smoothed shares (n+1)/(N+S) with S = union source count keep
    * one-sided sources finite. Determinism: shares are exact integer
    * ratios in double; ln terms follow the round-6 output discipline
    * (q107/q126); the double op tree is mirrored verbatim in the oracle.
    * Scale shape: two map-side-combined count aggregates, a full-outer
    * join of ≤|sources| rows, totals ride back as ONE broadcast row —
    * corpus rows never shuffle. */
  def mixtureDrift(oldDocs: DataFrame, newDocs: DataFrame, source: Column): DataFrame = {
    val o = oldDocs.groupBy(source.as("source")).agg(count(lit(1)).as("n_old"))
    val n = newDocs.groupBy(source.as("source")).agg(count(lit(1)).as("n_new"))
    val counts = o.join(n, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = counts.agg(sum(col("n_old")).as("__to"), sum(col("n_new")).as("__tn"),
      count(lit(1)).as("__s"))
    val so = (col("n_old") + 1).cast(DoubleType) / (col("__to") + col("__s")).cast(DoubleType)
    val sn = (col("n_new") + 1).cast(DoubleType) / (col("__tn") + col("__s")).cast(DoubleType)
    val m = (so + sn) / lit(2.0)
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_old"), col("n_new"),
        round(so, 6).as("share_old"),
        round(sn, 6).as("share_new"),
        round(sn * log(sn / so), 6).as("kl_term"),
        round(lit(0.5) * (so * log(so / m) + sn * log(sn / m)), 6).as("js_term"))
  }

  /** Cross-source score calibration (X119): raw quality scores are not
    * comparable across sources (different length/markup distributions
    * shift every heuristic), so a single global cutoff over-prunes one
    * source and under-prunes another. This emits the two standard
    * calibrated forms per row: `pct_rank` (percent_rank within source —
    * a global threshold then means "same percentile everywhere", the
    * CCNet-style per-shard rank trick) and `z` (per-source z-score for
    * distance-sensitive consumers).
    *
    * Determinism: percent_rank orders by score alone, so ties share a
    * rank and the result is partition-order-free; moments accumulate as
    * EXACT decimal sums (score at 6 decimals, squares at 12) and convert
    * to double once, in a fixed expression shape the oracle mirrors —
    * a naive double AVG/STDDEV is accumulation-order-dependent and not
    * hash-comparable.
    *
    * Scale shape: ONE source-keyed exchange, no join at all — the
    * moments are whole-partition window aggregates (computed once per
    * partition, constant state) over the same exchange and sort the rank
    * window already needs. Scores, not text, shuffle. */
  def scoreCalibrate(docs: DataFrame, source: Column, idCol: String,
      score: Column): DataFrame = {
    val id = col(idCol)
    val dec6 = DataTypes.createDecimalType(18, 6)
    val dec12 = DataTypes.createDecimalType(38, 12)
    val w = Window.partitionBy(col("source")).orderBy(col("score"))
    val wSrc = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val mean = col("__s").cast(DoubleType) / col("__n")
    val varr = (col("__s2").cast(DoubleType)
      - col("__s").cast(DoubleType) * col("__s").cast(DoubleType) / col("__n")) /
      (col("__n") - 1)
    docs.select(id, source.as("source"), score.as("score"))
      .select(id, col("source"), col("score"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        count(lit(1)).over(wSrc).as("__n"),
        sum(col("score").cast(dec6)).over(wSrc).as("__s"),
        sum((col("score").cast(dec6) * col("score").cast(dec6)).cast(dec12))
          .over(wSrc).as("__s2"))
      .select(id, col("source"), col("score"), col("pct_rank"),
        round(when(col("__n") > 1 && varr > 0,
          (col("score") - mean) / sqrt(varr)).otherwise(0.0), 6).as("z"))
  }

  /** Perplexity terciles per group (X66, the CCNet head/middle/tail
    * split, Wenzek et al. 1911.00359): rank docs by [[TextAnalysis
    * .lmScore]] perplexity within each group and bucket into thirds.
    *
    * Exact path (default): NTILE(3) over (ppl asc, id asc) — a total
    * order, oracle-checkable, but the per-group window SORTS the whole
    * group. At 100 TB pass `approx = true`: per-group tercile boundaries
    * via `percentile_approx` (GK sketch, rank error <= n/accuracy) ride
    * back as a broadcast join and docs bucket by VALUE comparison — no
    * per-group sort at all, the only full exchange is the group-keyed
    * sketch aggregate. Bucket sizes then deviate from exact thirds by at
    * most the rank error, and ppl TIES at a boundary all land in the
    * lower bucket (NTILE splits ties positionally) — both suite-pinned. */
  def pplBuckets(docs: DataFrame, refDocs: DataFrame, idCol: String,
      text: Column, group: Column, alpha: Double = 0.5,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val scores = TextAnalysis.lmScore(docs, refDocs, idCol, text, alpha)
    val joined = docs.select(col(idCol), group.as("grp"))
      .join(scores, Seq(idCol))
    if (approx) {
      val cuts = joined.groupBy(col("grp"))
        .agg(percentile_approx(col("ppl"),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("__cuts"))
      joined.join(broadcast(cuts), Seq("grp"))
        .withColumn("bucket",
          when(col("ppl") <= element_at(col("__cuts"), 1), "head")
            .when(col("ppl") <= element_at(col("__cuts"), 2), "middle")
            .otherwise("tail"))
        .select(joined.columns.map(col) :+ col("bucket"): _*)
    } else {
      val w = Window.partitionBy(col("grp")).orderBy(col("ppl").asc, col(idCol).asc)
      joined
        .withColumn("__t", ntile(3).over(w))
        .withColumn("bucket",
          when(col("__t") === 1, "head")
            .when(col("__t") === 2, "middle").otherwise("tail"))
        .drop("__t")
    }
  }

  /** Curriculum training order (X140) — the schedule export of
    * curriculum learning (Bengio et al., ICML 2009): documents are
    * banded by score quantile (ascending — band 0 is the lowest-score
    * `1/bands` of the corpus) and DETERMINISTICALLY shuffled within each
    * band ([[shardShuffle]]'s md5(id:seed) key, so epoch N+1 reshuffles
    * by changing only the seed), then assigned a dense global
    * `order_idx` in (band, shuffle_key, id) order — the exact sequence a
    * trainer consumes easy-to-hard (or hard-to-easy: negate the score).
    *
    * Banding is NOT a global percent_rank (single-partition window, the
    * scale-killer): the bands-1 quantile cuts come from ONE exact
    * `percentile` aggregate (interpolation identical to DuckDB's
    * quantile_cont — the [[graft.operators.CorpusStats.lengthStats]]
    * parity), broadcast by VALUE into a per-row comparison —
    * `band = #cuts <= score`, a score equal to a cut opens the next
    * band. The dense index is [[graft.util.DenseIds]]'s
    * range-partition + zipWithIndex scheme — no task holds more than its
    * partition, the driver holds one long per partition.
    *
    * CONTRACT: `score` non-null; ids unique (the order is total via the
    * id tie-break). Returns (id, score, band, shuffle_key, order_idx). */
  def curriculumOrder(docs: DataFrame, idCol: String, score: Column,
      bands: Int, seed: String): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(seed.nonEmpty, "seed must be non-empty")
    val base = docs.select(col(idCol).as("id"), score.cast(DoubleType).as("score"))
    val probs = (1 until bands).map(_.toDouble / bands)
    val cuts: Seq[Double] =
      if (probs.isEmpty) Nil
      else base.agg(percentile(col("score"),
          array(probs.map(lit): _*)).as("__c")).head().getSeq[Double](0)
    val band = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("score") >= lit(c), 1).otherwise(0) }
    val keyed = base
      .withColumn("band", band.cast(IntegerType))
      .withColumn("shuffle_key",
        md5(concat(col("id").cast(StringType), lit(":"), lit(seed))))
    graft.util.DenseIds.assign(keyed, "order_idx", 0L,
      col("band"), col("shuffle_key"), col("id"))
  }
}
