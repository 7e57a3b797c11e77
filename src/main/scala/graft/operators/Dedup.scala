package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle on a compact key (never on document bodies):
  *
  *  - exact: hash-groupBy on an md5 fingerprint (16 bytes/doc shuffled);
  *  - MinHash + LSH banding: shingle -> per-seed min-hash -> band keys ->
  *    bucket-join; candidate pairs only form inside buckets, turning the
  *    O(N²) pair space into sum-of-bucket-squares;
  *  - SimHash: one 64-bit sketch per doc (see [[graft.functions.SimHash64]]),
  *    near-dup = hamming <= t within LSH-style prefix buckets;
  *  - n-gram Jaccard: exact verify step over candidate pairs only;
  *  - embedding cosine: near-dup over vectors, bucketed by sign-bit bands.
  *
  * Hashes are md5-derived (cross-engine deterministic) rather than JVM
  * murmur, so every step is DuckDB-oracle-verifiable.
  *
  * Perf invariant: heavy per-row arrays (tokens, shingles, md5s,
  * signatures) are ALWAYS materialized as their own projection before
  * being consumed more than once — codegen does no common-subexpression
  * elimination inside HOF lambdas, so an inline `tokens(text)` under a
  * `transform` re-splits the text per element (measured 87s -> ~4s on the
  * sf0.1 banding query). The `with*` DataFrame methods below encode that
  * staging; the bare `Column` builders remain for single-use sites and
  * oracle parity.
  */
object Dedup {
  import TextAnalysis.{shinglesFromTokens, tokens}

  // ---- exact ------------------------------------------------------------

  /** Exact-dup groups: fingerprint -> (count, canonical doc = min id).
    * The fingerprint is projected before the groupBy so the normalize+md5
    * runs once per row, not again in the partial and final agg key paths. */
  def exactDupGroups(docs: DataFrame, idCol: String, text: Column): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.fingerprint(text).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("canonical_id"))
      .filter(col("dup_count") > 1)

  /** Exact dedup: keep one doc (min id) per fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col(idCol).asc)
    docs.withColumn("__fp", TextAnalysis.fingerprint(text))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__fp")
  }

  // ---- MinHash / LSH ----------------------------------------------------

  /** Modulus of the minhash permutation family: the largest prime below
    * 2^28. Public because the generated oracle SQL mirrors the exact
    * arithmetic (single source of truth for both engines). */
  val MinhashPrime: Long = 268435399L

  /** Per-seed multipliers/offsets of the universal hash family
    * `h -> (a*h + b) mod MinhashPrime`. All below 2^28, so `a*h + b`
    * stays under 2^56 — no Long overflow even with ANSI arithmetic. */
  val MinhashA: IndexedSeq[Long] = IndexedSeq(
    98317L, 196613L, 393241L, 786433L, 1572869L, 3145739L, 6291469L, 12582917L,
    25165843L, 50331653L, 100663319L, 201326611L, 49157L, 24593L, 12289L, 6151L)
  val MinhashB: IndexedSeq[Long] = IndexedSeq(
    7L, 8191L, 131071L, 524287L, 2147483L, 97L, 769L, 12289L,
    1299709L, 15485863L, 32452843L, 49979687L, 67867967L, 86028121L, 104395301L, 122949823L)

  /** 28-bit base hash per shingle — ONE md5 per shingle, parsed from the
    * first 7 hex chars. Each seed then applies a cheap arithmetic
    * permutation to the base instead of re-running md5, so an 8-hash
    * signature costs 1 md5 block per shingle instead of 9 (measured
    * ~4x on the sf0.1 banded-dedup query). */
  def shingleBases(sh: Column): Column =
    transform(sh, s => conv(substring(md5(s), 1, 7), 16, 10).cast(LongType))

  /** Per-seed min-hash over materialized shingle BASES:
    * min over shingles of `(a_seed * base + b_seed) mod MinhashPrime` — a
    * standard universal hash family, reproducible in any engine with md5
    * and 64-bit integer arithmetic. Empty shingle sets get the sentinel
    * MinhashPrime (unreachable by the pmod). */
  def seedMins(bases: Column, numHashes: Int): Column = {
    require(numHashes <= MinhashA.length,
      s"numHashes ($numHashes) exceeds the ${MinhashA.length} available hash-family seeds")
    val mins = (0 until numHashes).map { seed =>
      coalesce(
        array_min(transform(bases,
          h => pmod(lit(MinhashA(seed)) * h + lit(MinhashB(seed)), lit(MinhashPrime)))),
        lit(MinhashPrime))
    }
    array(mins: _*)
  }

  /** Signature from a shingle array (single-expression form — re-derives
    * the bases per seed; fixtures only, hot paths stage the bases). */
  def signatureFromShingles(sh: Column, numHashes: Int): Column =
    seedMins(shingleBases(sh), numHashes)

  /** MinHash signature from raw text (single-expression form — for tiny
    * fixtures and oracle SQL mirroring; hot paths use
    * [[withMinhashSignature]]). */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column =
    signatureFromShingles(shinglesFromTokens(tokens(text), shingleN), numHashes)

  /** docs + a `sig` column, with tokens, shingles AND shingle bases staged
    * as their own projections (see the object-level perf invariant). */
  def withMinhashSignature(docs: DataFrame, text: Column, shingleN: Int,
      numHashes: Int, out: String = "sig"): DataFrame =
    docs
      .withColumn("__toks", tokens(text))
      .withColumn("__sh", shinglesFromTokens(col("__toks"), shingleN))
      .withColumn("__bases", shingleBases(col("__sh")))
      .withColumn(out, seedMins(col("__bases"), numHashes))
      .drop("__toks", "__sh", "__bases")

  /** LSH band keys: signature split into bands of `rowsPerBand` hashes;
    * band key = band index + md5 of the concatenated band slice. Docs
    * sharing ANY band key are near-dup candidates. */
  def lshBandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    require(numHashes > 0 && rowsPerBand > 0 && numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a positive multiple of rowsPerBand ($rowsPerBand) — " +
        "otherwise hashes are silently truncated (or zero bands are produced " +
        "and every document reports no duplicates)")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1).cast(StringType))
      concat(lit(s"$b:"), md5(concat_ws("|", slice: _*)))
    }
    array(bands: _*)
  }

  /** Candidate near-dup pairs via MinHash LSH: explode band keys, self-join
    * within buckets (id1 < id2). The join key is the band hash — compact,
    * uniformly distributed, skew-resistant. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sig = withMinhashSignature(docs.select(col(idCol).as("doc_id"), text.as("__text")),
      col("__text"), shingleN, numHashes).select(col("doc_id"), col("sig"))
    val banded = sig.select(col("doc_id"),
      explode(lshBandKeys(col("sig"), numHashes, rowsPerBand)).as("band"))
    // shuffle-hash hint, twice deliberate: a broadcast self-join would
    // EXECUTE the signature pipeline twice (the built side re-computes);
    // with both sides shuffling the identical subplan, Spark's
    // ReuseExchange computes the signatures ONCE and reads the second side
    // from the same exchange files.
    banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Dedup provenance (X103): the audit trail a reproducible pipeline
    * stores NEXT TO its deduped output — for every removed document,
    * which kept document it duplicates and by which rule (`exact` =
    * normalized-fingerprint identity, `near` = LSH-candidate connected
    * component). Without this table "why is doc X missing from the
    * training set" is unanswerable a year later; with it, removals are
    * reversible and appealable (restore one cluster, not re-run the
    * corpus). Exact removal runs first; near-dup clustering sees only
    * exact survivors, so each document is removed exactly once, by the
    * cheapest rule that caught it.
    *
    * Scale shape: the composition of proven plans — fingerprint
    * hash-agg, [[minhashCandidatePairs]] banding, [[dedupGroups]] label
    * propagation — plus one anti-join; only ids and 16-byte fingerprints
    * shuffle. */
  def dedupProvenance(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"), TextAnalysis.fingerprint(text).as("__fp"))
    val canon = fp.groupBy(col("__fp")).agg(min(col("doc_id")).as("__keep"))
    val exactRemoved = fp.join(canon, Seq("__fp"))
      .filter(col("doc_id") =!= col("__keep"))
      .select(col("doc_id").as("removed_id"), col("__keep").as("kept_id"),
        lit("exact").as("method"))
    val survivors = docs.join(
      exactRemoved.select(col("removed_id").as(idCol)), Seq(idCol), "left_anti")
    val clusters = dedupGroups(minhashCandidatePairs(survivors, idCol, text))
    val nearRemoved = clusters.filter(col("id") =!= col("label"))
      .select(col("id").as("removed_id"), col("label").as("kept_id"),
        lit("near").as("method"))
    exactRemoved.unionByName(nearRemoved)
  }

  /** Leakage-safe split (X105): train/val/test assignment that keeps
    * every near-dup CLUSTER on one side of the boundary — splitting by
    * document hash leaks: a train doc's near-duplicate lands in test and
    * the eval measures memorization, not generalization (exactly what
    * [[splitLeakage]]/q99 detects after the fact; this PREVENTS it).
    * Every doc gets `group_id` = its connected-component label (its own
    * id when it has no near-dup), and the split is hashed on the GROUP
    * id via [[graft.util.Sampling.hashSplit]] — same determinism story,
    * fractions hold in expectation over groups.
    *
    * Scale shape: [[minhashCandidatePairs]] + [[dedupGroups]] as proven,
    * one left join of (id, label) pairs back onto ids, then a per-row
    * hash — the clustering dominates; the split adds nothing. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, text: Column,
      fractions: Seq[(String, Double)], salt: String = ""): DataFrame = {
    val clusters = dedupGroups(minhashCandidatePairs(docs, idCol, text))
    val labeled = docs.select(col(idCol))
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("label"), col(idCol)))
      .drop("label")
    graft.util.Sampling.hashSplit(labeled, col("group_id"), fractions, salt)
  }

  /** Near-dup threshold sweep (X96): histogram of EXACT hashed-shingle
    * jaccard over the banded candidate pairs, with a pairs-at-or-above
    * cumulative — the tuning table that picks the near-dup threshold
    * FROM DATA instead of folklore (0.8 merges X pairs, 0.7 merges Y; a
    * cliff in the cumulative marks the real dup/boilerplate boundary).
    * Population = pairs sharing ≥1 LSH band, i.e. exactly the pairs the
    * dedup pass would ever consider — the sweep answers "what would the
    * dedup DO at threshold t" by construction.
    *
    * Scale shape: candidate generation + verification are the proven
    * [[minhashCandidatePairs]]/[[jaccardVerifyHashed]] plans; the
    * histogram collapses to ≤11 rows before the final (bounded) window,
    * so the global cumulative is a non-issue at any corpus size. */
  def similarityHistogram(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = minhashCandidatePairs(docs, idCol, text, shingleN, numHashes, rowsPerBand)
    val sims = jaccardVerifyHashed(pairs, docs, idCol, text, shingleN)
    val bucket = least(floor(col("jaccard") * 10).cast(IntegerType), lit(9))
    sims.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("threshold", round(col("bucket").cast(DoubleType) / 10.0, 1))
      // ≤11 rows: the unpartitioned window is bounded by the bucket count
      .withColumn("n_at_or_above",
        sum(col("n_pairs")).over(Window.orderBy(col("bucket").desc)))
      .select(col("bucket"), col("threshold"), col("n_pairs"), col("n_at_or_above"))
  }

  /** Benchmark decontamination: which corpus docs share at least
    * `minOverlap` word n-gram shingles with which benchmark docs. The
    * standard pre-training hygiene step — training text that contains
    * eval-set n-grams inflates benchmark scores.
    *
    * Scale shape: both sides reduce to (id, shingle-hash) postings — the
    * 16-hex md5 base, never shingle text. The benchmark side is small BY
    * CONTRACT (it's an eval set), so its postings are explicitly
    * broadcast: the corpus postings never shuffle at all — no exchange
    * whose per-hash fan-out is df_corpus × df_bench (the hot-shingle
    * blowup a plan-estimated join can fall into when AQE under-sizes
    * the exploded side; measured 15.4 s → broadcast-hash at sf0.1).
    * The per-pair count then map-side-combines, so the only shuffle
    * carries (corpus_id, bench_id, partial_count) rows bounded by the
    * matching pairs.
    *
    * `broadcastBench` (default true) pins the plan to the broadcast
    * join. The default encodes the contract — eval suites are MBs, not
    * GBs — but a caller decontaminating against an unusually large
    * benchmark (a whole held-out split) can pass false and fall back
    * to the planner's shuffle join instead of hitting the broadcast
    * size ceiling mid-job; results are identical either way. */
  def contaminationScan(corpus: DataFrame, idCol: String, text: Column,
      benchmark: DataFrame, benchIdCol: String, benchText: Column,
      shingleN: Int = 5, minOverlap: Int = 1,
      broadcastBench: Boolean = true): DataFrame = {
    // one staging pipeline, not two: shingleSets already encodes the
    // tokens->shingles->distinct chain (and the codegen invariant).
    // explode_OUTER, deliberately: plain explode triggers
    // InferFiltersFromGenerate, whose inferred size(...)>0 predicate gets
    // pushed to the scan with the whole tokenize->shingle chain INLINED
    // (per-element re-split — the measured 87s-class blowup; 18s vs 3s on
    // this query at sf0.1). The outer variant adds no inferred filter;
    // empty-shingle rows yield a null hash, which the inner equi-join
    // drops — same result, one shingle evaluation per row.
    def postings(df: DataFrame, id: Column, t: Column, outId: String) =
      shingleSets(df.select(id.as("doc_id"), t.as("__text")), "doc_id", col("__text"), shingleN)
        .select(col("doc_id").as(outId), explode_outer(col("sh")).as("__sh"))
        .select(col(outId), substring(md5(col("__sh")), 1, 16).as("__h"))
    val bench = postings(benchmark, col(benchIdCol), benchText, "bench_id")
    postings(corpus, col(idCol), text, "doc_id")
      .join(if (broadcastBench) broadcast(bench) else bench, Seq("__h"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minOverlap)
  }

  /** Asymmetric containment detection (X120; Broder 1997, "On the
    * resemblance and containment of documents"): for candidate pairs,
    * c(A,B) = |S(A) ∩ S(B)| / |S(A)| — near 1 when A is QUOTED inside a
    * larger B. The case symmetric Jaccard structurally misses: a tweet
    * pasted into a news roundup scores Jaccard ≈ |A|/|B| ≈ 0 but
    * containment ≈ 1, and quote-farms are a real dup class n-gram
    * pipelines must catch. Emits both directions (`c1` = fraction of
    * id1's shingles found in id2, `c2` the reverse) plus the raw counts.
    *
    * The `maxDf` stop-shingle cut is the scale guard: a shingle present
    * in d documents generates d²÷2 candidate pairs, so boilerplate
    * shingles ("all rights reserved") must not join. Shingles with
    * df > maxDf (or df = 1, which cannot pair) are cut BEFORE the
    * self-join; denominators stay the FULL set sizes, so reported
    * containment undercounts by at most the pair's stop-shingle mass —
    * the standard trade, documented here rather than hidden.
    *
    * Scale shape: the tokenize→shingle→hash chain is evaluated exactly
    * twice — once feeding the df census (map-side-combined counts,
    * constant-size buffers: a boilerplate shingle in millions of docs
    * never builds a list), once feeding the postings shuffle (an earlier
    * draft re-derived it SIX times — census, postings, and 2× in each
    * pushed size-lookup filter — and that, not data volume, dominated
    * the bench at sf0.1: 8.6 s → 4.0 s). Postings carry
    * (doc_id, n_sh, 28-bit hash) — text never shuffles; the explicit
    * `repartition(__h)` co-partitions the census join and lets
    * `collect_list` — bounded at maxDf — aggregate in place. Candidate
    * pairs are generated IN-GROUP from each sorted list (at most
    * maxDf·(maxDf-1)/2 per shingle, in-memory) with both denominators
    * riding along as struct fields, so there are no id-keyed size joins
    * at all; the only other exchange is the (id1, id2) pair
    * aggregate. */
  def containmentPairs(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, maxDf: Int = 1000, minShared: Int = 1): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (df-1 shingles cannot pair), got $maxDf")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val sets = shingleHashSets(docs, idCol, text, shingleN)
    // explode_OUTER for the same InferFiltersFromGenerate reason as
    // contaminationScan: the inner variant re-inlines the whole
    // tokenize->shingle chain into a pushed size()>0 predicate. Null
    // hashes (shingle-less docs) drop at the isNotNull filter. n_sh (the
    // FULL distinct-set size — denominators ignore the df cut by design)
    // rides along with every posting.
    val post = sets
      .select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"),
        explode_outer(col("sh")).as("__h"))
      .filter(col("__h").isNotNull)
      .repartition(col("__h"))
    val pairable = post.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDf)
      .select(col("__h"))
    // co-partitioned join + in-place list aggregate: no exchange beyond
    // the one above. sort_array over (doc_id, n_sh) structs orders by
    // doc_id, making i<j positions the id1<id2 pairs.
    val lists = post.join(pairable, Seq("__h"))
      .groupBy(col("__h"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("__ids"))
    val ids = col("__ids")
    val pairGen = flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids) - i - 1),
        y => struct(x.getField("doc_id").as("id1"), y.getField("doc_id").as("id2"),
          x.getField("n_sh").as("n1"), y.getField("n_sh").as("n2")))))
    lists
      .select(explode(pairGen).as("__p"))
      .groupBy(col("__p.id1").as("id1"), col("__p.id2").as("id2"))
      .agg(count(lit(1)).as("n_shared"), min(col("__p.n1")).as("n1"),
        min(col("__p.n2")).as("n2"))
      .filter(col("n_shared") >= minShared)
      .select(col("id1"), col("id2"), col("n_shared"), col("n1"), col("n2"),
        round(col("n_shared").cast(DoubleType) / col("n1").cast(DoubleType), 6)
          .as("c1"),
        round(col("n_shared").cast(DoubleType) / col("n2").cast(DoubleType), 6)
          .as("c2"))
  }

  /** Corpus snapshot diff: classify every doc id across two snapshots as
    * `added` / `removed` / `changed` / `unchanged` by comparing content
    * fingerprints ([[TextAnalysis.fingerprint]] — whitespace-normalized,
    * so reflow alone is `unchanged`). The crawl-over-crawl delta report
    * that drives incremental re-embedding (only `added`+`changed` go back
    * through the embed queue) and snapshot-drift dashboards.
    *
    * Scale shape: both sides collapse to (id, 16-hex fp) before the ONE
    * full-outer id-keyed join — text never crosses the exchange. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      text: Column): DataFrame = {
    val o = oldDocs.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(text).as("__fo"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(text).as("__fn"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("__fo").isNull, "added")
          .when(col("__fn").isNull, "removed")
          .when(col("__fo") === col("__fn"), "unchanged")
          .otherwise("changed"))
      .select(col("doc_id").as(idCol), col("status"))
  }

  /** Incremental ingest dedup: drop new documents whose content
    * fingerprint already exists in a historical corpus, WITHOUT joining
    * every new doc against the (much larger) history.
    *
    * A Bloom filter over the history's fingerprints — built by Spark's
    * own `BloomFilterAggregate` (the runtime-filter machinery) in one
    * shuffle-free pass, a few MB for hundreds of millions of keys —
    * rides broadcast to the new batch. Definitely-new docs (filter says
    * no) skip the join entirely; only might-contain hits (true matches +
    * the configured false-positive sliver) pay the exact anti-join. At a
    * typical crawl's ~1-10% revisit rate this cuts the join probe volume
    * by 10-100x. The RESULT is exact regardless of filter sizing: false
    * positives are cleared by the anti-join, and the Bloom filter has no
    * false negatives — the oracle is a plain anti-join.
    *
    * Sizing: Spark clamps the aggregate to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4,000,000 — also this parameter's default) and `...maxNumBits`.
    * A history far beyond the clamp saturates the filter: the result
    * stays exact but every doc degrades to the anti-join path — raise
    * those confs along with `expectedHistoryItems` for larger
    * histories. */
  def incrementalDedup(newDocs: DataFrame, history: DataFrame, idCol: String,
      text: Column, historyText: Column,
      expectedHistoryItems: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.GraftSql
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(!newDocs.columns.contains("__fp"),
      "incrementalDedup uses '__fp' internally; rename the existing column first")
    val histFp = history.select(TextAnalysis.fingerprint(historyText).as("fp"))
    // the sketch rides into the probe side as a SCALAR SUBQUERY (the only
    // non-literal form might_contain accepts) — fully lazy, no driver
    // round-trip in this operator
    val bloom = histFp.agg(GraftSql.column(
      new BloomFilterAggregate(GraftSql.expression(xxhash64(col("fp"))),
        expectedHistoryItems).toAggregateExpression()).as("bf")).scalar()
    val staged = newDocs.withColumn("__fp", TextAnalysis.fingerprint(text))
    // coalesce to false: an EMPTY history makes the aggregate (and thus
    // might_contain) evaluate to null, and a null predicate fails BOTH
    // filter branches — without it a bootstrap ingest silently discards
    // the entire first batch
    val might = coalesce(GraftSql.column(BloomFilterMightContain(
      GraftSql.expression(bloom),
      GraftSql.expression(xxhash64(col("__fp"))))), lit(false))
    val sureNew = staged.filter(!might)
    // no distinct() on the build side: anti-join output is unaffected by
    // duplicate build rows, and the distinct would cost an extra
    // exchange+aggregate over every history fingerprint
    val verified = staged.filter(might)
      .join(histFp.withColumnRenamed("fp", "__fp"), Seq("__fp"), "left_anti")
    sureNew.unionByName(verified).drop("__fp")
  }

  /** Distinct shingle set per doc, staged (doc_id, sh). */
  def shingleSets(docs: DataFrame, idCol: String, text: Column, shingleN: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"), array_distinct(shinglesFromTokens(col("__toks"), shingleN)).as("sh"))

  /** Distinct 28-bit shingle-HASH set per doc — the compact form for
    * jaccard verification at scale: set ops compare longs instead of
    * ~20-char shingle strings, and the join exchange carries 8 bytes per
    * shingle. A 28-bit collision between two distinct shingles of the
    * same doc pair (~|A|·|B|/2^28) perturbs the estimate by <1/|A∪B| —
    * immaterial against near-dup thresholds. */
  def shingleHashSets(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(text).as("__toks"))
      .withColumn("__sh", shinglesFromTokens(col("__toks"), shingleN))
      .select(col("doc_id"), array_distinct(shingleBases(col("__sh"))).as("sh"))

  /** [[jaccardVerify]] over hashed shingle sets ([[shingleHashSets]]) —
    * same output shape, integer set ops. Preferred at scale. */
  def jaccardVerifyHashed(pairs: DataFrame, docs: DataFrame, idCol: String,
      text: Column, shingleN: Int = 3): DataFrame =
    jaccardOver(pairs, shingleHashSets(docs, idCol, text, shingleN))

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (columns id1, id2): |A ∩ B| / |A ∪ B| over distinct shingles. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3): DataFrame =
    jaccardOver(pairs, shingleSets(docs, idCol, text, shingleN))

  /** Shared jaccard core over a prepared (doc_id, sh) set frame. */
  private def jaccardOver(pairs: DataFrame, sets: DataFrame): DataFrame = {
    // shuffle_hash: the shingle frame LOOKS small to the planner (array
    // sizes are underestimated) but is wide per doc — broadcasting it
    // builds a huge driver-side table, twice. Shuffling moves each doc's
    // shingles exactly once.
    val sh = sets.hint("shuffle_hash")
    pairs
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("sh", "sh2"), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast(DoubleType))
      // |A u B| = |A| + |B| - |A n B| (shingle sets are distinct) — saves
      // materializing the union array, the widest intermediate here
      .withColumn("uni",
        (size(col("sh1")) + size(col("sh2"))).cast(DoubleType) - col("inter"))
      .withColumn("jaccard", round(when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")), 6))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Near-dup CLUSTERS from candidate pairs: connected components via
    * min-label propagation (each node repeatedly adopts the smallest label
    * among itself and its neighbors — the simplified large-star/small-star
    * scheme). Returns (id, label) where label = min doc id of the
    * component, i.e. the canonical document.
    *
    * Scale notes: each iteration is one join + hash agg on compact
    * (id, label) pairs; iterations are bounded by the component DIAMETER
    * (near-dup clusters are shallow — a handful of rounds), and lineage is
    * cut per iteration with an eager localCheckpoint so the plan does not
    * grow exponentially. */
  def dedupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // pin the candidate-pair plan BEFORE mirroring: the union's two
    // branches would otherwise each execute the (expensive) upstream LSH
    // pipeline once — measured 2x the pipeline cost on the end-to-end
    // query. Checkpoint once, then mirror the cheap checkpointed frame.
    val p = pairs.select(col("id1"), col("id2")).localCheckpoint(true)
    val edges = p.union(p.select(col("id2").as("id1"), col("id1").as("id2")))
    var labels = edges.select(col("id1").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // the pin backing the CURRENT `labels`; superseded pins are released
    // each round (a deep component would otherwise hold every round's
    // copy in the block manager at once — the round-7 accretion)
    var pin = labels
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, edges("id2") === labels("id"))
        .groupBy(edges("id1").as("id")).agg(min(col("label")).as("nlabel"))
      // eager checkpoint EVERY round, measured deliberately: without it
      // each round's convergence action re-executes all prior rounds
      // (O(rounds^2) recompute — slower than the extra job), and path
      // compression is useless here (LSH components converge in ~3
      // rounds; the extra join per round costs more than it saves)
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("next"))
        .localCheckpoint(true)
      converged = updated.filter(col("next") =!= col("label")).isEmpty
      labels = updated.select(col("id"), col("next").as("label"))
      graft.util.Pins.release(pin) // previous round is dead once `updated` materialized
      pin = updated
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dedupGroups did not converge within $maxIter iterations - " +
          "labels are intermediate; raise maxIter for components with diameter > maxIter")
    // the edge pin is unreachable from the returned frame (lineage cut by
    // the per-round checkpoints); the result itself stays backed by the
    // LAST round's pin — callers release it via Pins.release(result) when
    // done (see graft.util.Pins)
    graft.util.Pins.release(p)
    labels
  }

  /** Keep one document per near-dup cluster (the canonical = min id);
    * documents in no cluster pass through. The end of the dedup pipeline:
    * candidates -> verify -> [[dedupGroups]] -> keepCanonical. */
  def keepCanonical(docs: DataFrame, idCol: String, groups: DataFrame): DataFrame = {
    val losers = groups.filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash per doc from md5-derived token hashes (first 16 hex
    * chars of md5 -> long). One long per doc; near-dups have small hamming
    * distance. */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))
    VectorFunctions.simHash64(hashes)
  }

  /** 16-bit simhash bits from a materialized array of token md5 hex
    * strings: bit b votes on whether hex char b is >= '8'. */
  def simhash16FromMd5s(md5s: Column): Column = {
    val bits = (0 until 16).map { b =>
      val votes = aggregate(md5s, lit(0),
        (acc, h) => acc + when(substring(h, b + 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Cross-engine-checkable 16-bit simhash from raw text (single-expression
    * form; recomputes md5 per bit — fixtures/oracle only). */
  def simhash16(text: Column): Column =
    simhash16FromMd5s(transform(tokens(text), t => md5(t)))

  /** docs + 16-bit simhash, with the per-token md5 array materialized once
    * (16 bit-votes then scan the SAME md5 array instead of re-hashing
    * every token 16 times). */
  def withSimhash16(docs: DataFrame, text: Column, out: String = "simhash"): DataFrame =
    docs
      .withColumn("__toks", tokens(text))
      .withColumn("__md5s", transform(col("__toks"), t => md5(t)))
      .withColumn(out, simhash16FromMd5s(col("__md5s")))
      .drop("__toks", "__md5s")

  // ---- embedding near-dup ----------------------------------------------

  /** Sign-bit band key for band `b`: the `bandBits` sign bits starting at
    * dimension `b * bandBits`, as a '0'/'1' string prefixed by the band
    * index. */
  def signBandKey(vec: Column, band: Int, bandBits: Int): Column =
    concat(lit(s"$band:"), concat_ws("", (0 until bandBits).map(i =>
      when(element_at(vec, band * bandBits + i + 1) > 0f, "1").otherwise("0")): _*))

  /** Embedding near-dup pairs via sign-bit LSH banding: `numBands` band
    * keys per vector (band b = bandBits consecutive sign bits), candidates
    * = pairs sharing ANY band, then exact cosine >= threshold.
    *
    * Scale design: a single short prefix (the previous shape) caps the
    * bucket count at 2^bits and the hot bucket goes quadratic at 100 TB;
    * bands multiply the bucket space to numBands * 2^bandBits while
    * RAISING recall (a near-dup pair only needs one band to agree —
    * P[candidate] = 1 - (1 - p^bandBits)^numBands), and the exact-cosine
    * verify keeps precision. bandBits is the knob that bounds per-bucket
    * population; 16 bits -> 65k buckets per band. */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String,
      bandBits: Int = 16, numBands: Int = 4, threshold: Double = 0.95): DataFrame = {
    val base = embs.select(col(idCol).as("doc_id"), col(vecCol).as("v"))
    // Fail fast instead of banding past the vector's end: element_at
    // beyond the array either throws (ANSI) or yields null -> '0' bits,
    // which would silently collapse the out-of-range bands into one
    // all-zero bucket (quadratic candidate blowup, meaningless recall).
    // Embedding columns are fixed-dim, so the first row's size stands in
    // for the column's dim without an extra full scan.
    base.select(size(col("v"))).take(1).foreach { r =>
      // size(null) is null — a null first vector must raise a clear error,
      // not an opaque NPE from Row.getInt
      require(!r.isNullAt(0), s"embeddingNearDups: null $vecCol in the first row")
      val dim = r.getInt(0)
      require(numBands * bandBits <= dim,
        s"numBands ($numBands) * bandBits ($bandBits) = ${numBands * bandBits} " +
          s"exceeds the embedding dimension ($dim)")
    }
    // candidate pairs carry IDS ONLY through the banding join + distinct —
    // a pair sharing k bands would otherwise shuffle both full vectors k
    // times through the widest exchange; vectors are re-attached once per
    // surviving pair (shuffle_hash: array sizes are underestimated and
    // the planner would broadcast a multi-GB build at scale)
    val banded = base.select(col("doc_id"),
      explode(array((0 until numBands).map(b => signBandKey(col("v"), b, bandBits)): _*))
        .as("bucket"))
    val pairs = banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    pairs
      .join(base.select(col("doc_id").as("id1"), col("v").as("v1")).hint("shuffle_hash"), Seq("id1"))
      .join(base.select(col("doc_id").as("id2"), col("v").as("v2")).hint("shuffle_hash"), Seq("id2"))
      .withColumn("cosine", VectorFunctions.vecCosine(col("v1"), col("v2")))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
  }

  // ---- line-level cross-document dedup ----------------------------------

  /** Cross-document line-level dedup — the boilerplate pass of a web-corpus
    * pipeline (RefinedWeb/CCNet remove nav bars, cookie banners, and promo
    * footers this way): a line whose exact text appears in at least
    * `minDocs` DISTINCT documents is boilerplate and is dropped from every
    * document; surviving lines keep their original order. Lines shorter
    * than `minLen` chars are never dedup candidates (blank lines and
    * separators recur across unrelated documents by nature and must stay).
    *
    * Emits `(doc_id, n_lines, n_removed, text_clean)`.
    *
    * Scale shape: the duplicate-line census groups on a 16-byte md5 prefix
    * of the line, never the raw text — a 1 KB boilerplate line repeated a
    * billion times would otherwise ride the widest exchange in full (same
    * convention as [[fingerprint]]). The qualifying dup-key set is tiny
    * next to the corpus (boilerplate is by definition few DISTINCT lines),
    * so AQE turns the flagging join into a broadcast when it fits; the
    * reassembly is ONE doc_id exchange of (pos, line) structs. */
  def lineDedup(docs: DataFrame, idCol: String, text: Column,
      minDocs: Int = 2, minLen: Int = 5): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // posexplode (not explode): the reassembly sort key must be the line's
    // original position — re-sorting by content would shuffle the document
    // the key is staged as a named column so the census exchange, the
    // flagging join, and the plan audit all see ONE md5 computation
    val lines = docs.select(col(idCol).as("doc_id"),
        posexplode(split(text, "\n", -1)).as(Seq("pos", "line")))
      .withColumn("lk", substring(md5(col("line")), 1, 16))
    val dupKeys = lines
      .filter(length(col("line")) >= minLen)
      .groupBy(col("lk"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("lk"))
    val flagged = lines.join(
      dupKeys.withColumn("__dup", lit(true)), Seq("lk"), "left")
    flagged.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        // count of non-null flags = removed lines (count skips nulls)
        count(col("__dup")).as("n_removed"),
        concat_ws("\n",
          transform(
            // collect_list skips the nulls the `when` leaves for removed
            // lines; array_sort on (pos, line) structs restores order
            array_sort(collect_list(when(col("__dup").isNull,
              struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("text_clean"))
      .withColumnRenamed("doc_id", idCol)
  }

  /** Per-document n-gram novelty against the whole corpus: the fraction
    * of the doc's DISTINCT hashed shingles ([[shingleHashSets]], the q67
    * 28-bit convention) occurring in NO other document. 1.0 = fully
    * novel; boilerplate- or template-heavy docs sink toward 0 even when
    * no single pairwise near-dup crosses a threshold — the signal
    * pairwise dedup can't see. The inverse view of [[contaminationScan]]
    * pointed at the corpus itself.
    *
    * Docs with no shingles (fewer than `shingleN` tokens) have no
    * denominator and are omitted.
    *
    * Scale shape: postings carry (doc_id, 8-byte hash) only; one hash
    * exchange for the census (map-side combine), one doc_id exchange for
    * the re-aggregation. explode_outer + isNotNull above the generate —
    * the [[contaminationScan]] guard against InferFiltersFromGenerate
    * re-inlining the shingle chain below the explode. A 28-bit collision
    * marks ~|corpus-shingles|/2^28 of a doc's shingles falsely non-novel
    * — immaterial against curation thresholds. */
  def noveltyScore(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3): DataFrame = {
    val posts = shingleHashSets(docs, idCol, text, shingleN)
      .select(col("doc_id"), explode_outer(col("sh")).as("h"))
      .filter(col("h").isNotNull)
    val census = posts.groupBy(col("h")).agg(count(lit(1)).as("nd"))
    posts.join(census, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("nd") === 1, 1)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast(DoubleType) / col("n_shingles").cast(DoubleType), 6))
      .withColumnRenamed("doc_id", idCol)
  }

  // ---- winnowing sketches -----------------------------------------------

  /** Winnowing document sketch (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * the minimum shingle hash of every `window` consecutive shingles,
    * deduplicated — a guaranteed-detection fingerprint diet. Any shared
    * token run of length >= window + shingleN - 1 between two documents
    * shares at least one selected fingerprint, at ~2/(window+1) the
    * density of the full shingle set — the postings diet for overlap
    * scans ([[contaminationScan]]-style joins over sketches instead of
    * full shingle sets). Hashes are the 28-bit [[shingleBases]] (q67
    * convention, oracle-reproducible).
    *
    * Documents with fewer than `window` shingles have no window and drop.
    * Emits distinct `(doc_id, fp)` postings. */
  def winnowedSketch(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, window: Int = 4): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    val staged = docs
      .select(col(idCol).as("doc_id"), tokens(text).as("__toks"))
      .withColumn("__sh", shinglesFromTokens(col("__toks"), shingleN))
      .withColumn("__h", shingleBases(col("__sh")))
    // the `when` guard keeps sequence() ascending (the bigramTable
    // descending-range trap); explode_outer dodges
    // InferFiltersFromGenerate re-inlining the chain below the generate
    val minima = when(size(col("__h")) >= window,
      array_distinct(transform(sequence(lit(0), size(col("__h")) - window),
        i => array_min(slice(col("__h"), i + 1, lit(window))))))
    staged.select(col("doc_id"), explode_outer(minima).as("fp"))
      .filter(col("fp").isNotNull)
  }

  /** Document pairs sharing at least `minShared` winnowed fingerprints —
    * the sketch-level overlap scan. Same join discipline as the other
    * near-dup paths: the exchange carries (doc_id, 8-byte fp) postings
    * only, pair cost is per-fp bucket-bounded, never all-pairs. */
  def winnowedOverlap(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, window: Int = 4, minShared: Int = 1): DataFrame = {
    val sk = winnowedSketch(docs, idCol, text, shingleN, window)
    sk.as("a")
      .join(sk.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Duplicated-span extraction (X121; the scalable form of Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §3 ExactSubstr): per document, the MAXIMAL UNIONS
    * of the covered token ranges of duplicated `windowLen`-token windows
    * — the spans an exact-substring dedup pass would cut (boilerplate
    * headers, licence blocks, quoted articles), found without building a
    * suffix array. A window occurring >= 2 times ANYWHERE (other docs or
    * a repeat within the same doc — both are duplication in the
    * training-data sense) is duplicated; covered ranges that touch OR
    * are exactly adjacent coalesce (next_pos - pos <= windowLen), so a
    * merged span may contain seam windows straddling two adjacent
    * covered ranges that are not themselves duplicated — the cut token
    * set is identical either way, which is what [[cutSpans]] consumes.
    * Emits
    * `(doc_id, span_start, span_end, n_tokens)` with token positions
    * 0-based, end exclusive; every span has n_tokens >= windowLen.
    *
    * The windowLen knob is the paper's 50-token threshold: spans
    * shorter than the window cannot be detected (by design — short
    * matches are coincidence, Lee et al. §3.1).
    *
    * Scale shape: occurrence postings are (doc_id, pos, 64-bit md5
    * prefix) — text never shuffles. The census join follows the
    * [[containmentPairs]] discipline: one explicit `repartition(__h)`
    * co-partitions the map-side-combined occurrence census with the
    * postings filter; the only other exchange is the doc-keyed
    * island merge (lag + running-sum gaps-and-islands windows and the
    * span aggregate all share it). */
  def dupSpans(docs: DataFrame, idCol: String, text: Column,
      windowLen: Int = 50): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    import org.apache.spark.sql.expressions.Window
    val staged = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .withColumn("__sh", TextAnalysis.shinglesFromTokens(col("__toks"), windowLen))
    // posexplode_OUTER: the inner variant triggers InferFiltersFromGenerate,
    // which re-inlines the tokenize->shingle chain into a pushed size()>0
    // scan predicate (the containmentPairs lesson).
    val post = staged
      .select(col("doc_id"), posexplode_outer(col("__sh")).as(Seq("pos", "__g")))
      .filter(col("__g").isNotNull)
      .select(col("doc_id"), col("pos"), substring(md5(col("__g")), 1, 16).as("__h"))
      .repartition(col("__h"))
    val dupHashes = post.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("__h"))
    val marked = post.join(dupHashes, Seq("__h")).select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(wd) <= windowLen, 0).otherwise(1))
      .withColumn("__isl", sum(col("__new")).over(wd))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + windowLen).cast(LongType).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
  }

  /** Cross-corpus contaminated-span detection (X133; the decontamination
    * use of Lee et al. 2107.06499's ExactSubstr, §6.2 — the pass that
    * keeps EVAL data out of the training set at span level, where X56's
    * doc-level n-gram leakage score can only flag whole documents): per
    * TRAIN document, the maximal unions of covered token ranges of
    * `windowLen`-token windows that also occur ANYWHERE in `test` — the
    * spans [[cutSpans]] then removes. A single occurrence in test marks
    * a train window contaminated (leakage is asymmetric: the test side
    * needs no census, just membership).
    *
    * Both frames are read through the same (idCol, text) accessors;
    * emits `(doc_id, span_start, span_end, n_tokens)` over TRAIN ids
    * with [[dupSpans]]' span conventions (0-based, end exclusive,
    * adjacent covered ranges coalesce).
    *
    * Scale shape: the [[dupSpans]] postings discipline on both sides —
    * (doc_id, pos, 64-bit md5 prefix) for train, a DISTINCT hash SET for
    * test (positions dropped before the exchange); text never shuffles.
    * The membership join is co-partitioned on the hash (one explicit
    * train-side repartition, the test distinct lands on the same key);
    * the island merge is the one doc-keyed exchange. Train is the big
    * side by construction (test/eval corpora are small), so at 100 TB
    * the test hash set is millions of 16-byte rows against billions —
    * the join broadcasts or stays a hash-set probe either way. */
  def contaminatedSpans(train: DataFrame, test: DataFrame, idCol: String,
      text: Column, windowLen: Int = 50): DataFrame = {
    require(windowLen >= 2, s"windowLen must be >= 2, got $windowLen")
    import org.apache.spark.sql.expressions.Window
    def posts(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .withColumn("__sh", TextAnalysis.shinglesFromTokens(col("__toks"), windowLen))
      // posexplode_OUTER: the inner variant triggers InferFiltersFromGenerate
      // re-inlining the tokenize->shingle chain below the generate (the
      // containmentPairs lesson, same as dupSpans)
      .select(col("doc_id"), posexplode_outer(col("__sh")).as(Seq("pos", "__g")))
      .filter(col("__g").isNotNull)
      .select(col("doc_id"), col("pos"),
        substring(md5(col("__g")), 1, 16).as("__h"))
    val trainPosts = posts(train).repartition(col("__h"))
    val testHashes = posts(test).select(col("__h")).distinct()
    val marked = trainPosts.join(testHashes, Seq("__h"))
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(wd) <= windowLen, 0).otherwise(1))
      .withColumn("__isl", sum(col("__new")).over(wd))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + windowLen).cast(LongType).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("n_tokens"))
  }

  /** LSH banding planner (X126; the S-curve analysis of Leskovec/
    * Rajaraman/Ullman, "Mining of Massive Datasets" §3.4.2): for every
    * (bands b, rows r) factorization of `numHashes` and every probed
    * Jaccard level s, the probability a true s-similar pair shares at
    * least one band bucket — `p = 1 - (1 - s^r)^b`. This is the design
    * table behind [[minhashCandidatePairs]]'s (numHashes, rowsPerBand)
    * knobs: more bands catches lower similarity (recall) but floods the
    * candidate stage (precision); the caller reads the curve and picks
    * the knee nearest their dedup threshold. Emits
    * `(n_hashes, bands, rows, jaccard, p_detect)`.
    *
    * Determinism: the powers are SEQUENTIAL LEFT-FOLD multiplications
    * (`aggregate` over a sequence), not `pow` — float pow differs in the
    * last ulp across libm implementations, a fold of IEEE multiplies
    * does not, so the oracle reproduces every p bit-for-bit.
    *
    * A planning table, not a corpus pass: |divisors(numHashes)| ×
    * |jaccards| rows from a literal frame — no scan, no exchange beyond
    * the final sort. */
  def lshPlan(spark: SparkSession, numHashes: Int,
      jaccards: Seq[Double]): DataFrame = {
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    require(jaccards.nonEmpty && jaccards.forall(s => s >= 0.0 && s <= 1.0),
      s"jaccard probe levels must be in [0,1], got $jaccards")
    import spark.implicits._
    val base = (for {
      b <- 1 to numHashes if numHashes % b == 0
      s <- jaccards
    } yield (numHashes, b, numHashes / b, s))
      .toDF("n_hashes", "bands", "rows", "jaccard")
    val sr = aggregate(sequence(lit(1), col("rows")), lit(1.0),
      (acc, _) => acc * col("jaccard"))
    val miss = aggregate(sequence(lit(1), col("bands")), lit(1.0),
      (acc, _) => acc * (lit(1.0) - sr))
    base
      .select(col("n_hashes"), col("bands"), col("rows"), col("jaccard"),
        round(lit(1.0) - miss, 6).as("p_detect"))
      .orderBy(col("bands"), col("jaccard"))
  }

  /** Empirical LSH calibration (X144) — the MEASURED complement of
    * [[lshPlan]]'s theoretical S-curve: run every candidate banding
    * scheme against ground-truth exact Jaccard on the given (sampled)
    * frame and report realized precision/recall per similarity floor.
    * The theory curve assumes idealized permutations and says nothing
    * about the CANDIDATE VOLUME a real corpus produces (boilerplate
    * shingles, skewed band buckets); this pass measures both on the
    * corpus's own text, and a curator reads theory (X126) and
    * measurement (X144) side by side before fixing the dedup knobs.
    * Emits `(bands, rows, threshold, n_truth, n_cand, n_hit, precision,
    * recall)` — precision/recall are NULL when their denominator is 0
    * (no candidates / no true pairs at that floor), not a fake 0 or 1.
    *
    * Ground truth: pairs sharing >= 1 shingle base, scored with the
    * [[jaccardVerifyHashed]] arithmetic (|A∩B| via a postings self-join
    * on the 28-bit bases, |A∪B| = |A|+|B|−|A∩B|); a pair with no shared
    * shingle has Jaccard 0 and cannot clear any positive floor, so the
    * co-shingled universe IS the truth set. LSH candidates that share
    * no shingle (band-hash coincidences) still count against precision
    * via the left join's 0 default.
    *
    * Scale shape: calibration runs on a bounded SAMPLE by contract —
    * the caller passes a deterministically sampled frame (the truth
    * side's co-shingled pair universe is inherently quadratic in dup
    * mass; at corpus scale you calibrate on a slice, then run the chosen
    * scheme corpus-wide). Within the sample: the (doc_id, sh, sig)
    * staging is pinned ONCE (eager localCheckpoint) and fanned out to
    * the truth join and every scheme's band join — the signature
    * pipeline executes once, not 2×|grid|+1 times; all exchanges carry
    * ids, 8-byte bases, or 16-byte band keys, never text. The returned
    * frame is aggregated (|grid|×|thresholds| rows) but BACKED by the
    * pin — callers release via [[graft.util.Pins.release]] after
    * materializing (the [[dedupGroups]] contract). */
  def lshCalibrate(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int, numHashes: Int, rowsGrid: Seq[Int],
      thresholds: Seq[Double]): DataFrame = {
    require(rowsGrid.nonEmpty && rowsGrid.distinct == rowsGrid &&
      rowsGrid.forall(r => r >= 1 && numHashes % r == 0),
      s"rowsGrid must be distinct divisors of numHashes ($numHashes), got $rowsGrid")
    require(thresholds.nonEmpty && thresholds.distinct == thresholds &&
      thresholds.forall(t => t > 0.0 && t <= 1.0),
      s"thresholds must be distinct values in (0,1], got $thresholds")
    val spark = docs.sparkSession
    import spark.implicits._
    val staged = docs
      .select(col(idCol).as("doc_id"), text.as("__text"))
      .withColumn("__toks", tokens(col("__text")))
      .withColumn("__sh", shinglesFromTokens(col("__toks"), shingleN))
      .withColumn("sh", array_distinct(shingleBases(col("__sh"))))
      .select(col("doc_id"), col("sh"), seedMins(col("sh"), numHashes).as("sig"))
      .localCheckpoint(true)
    // truth: exact Jaccard over the co-shingled pair universe
    val post = staged.select(col("doc_id"), explode(col("sh")).as("b"))
    val inter = post.as("a").hint("shuffle_hash")
      .join(post.as("b").hint("shuffle_hash"),
        col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).cast(DoubleType).as("ni"))
    val sizes = staged.select(col("doc_id"), size(col("sh")).cast(DoubleType).as("n"))
    val truth = inter
      .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n", "n1"), Seq("id1"))
      .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n", "n2"), Seq("id2"))
      .select(col("id1"), col("id2"),
        round(col("ni") / (col("n1") + col("n2") - col("ni")), 6).as("jacc"))
      .localCheckpoint(true)
    // candidates, one banding scheme per grid entry (distinct pairs each)
    val cands = rowsGrid.map { r =>
      val banded = staged.select(col("doc_id"),
        explode(lshBandKeys(col("sig"), numHashes, r)).as("band"))
      banded.as("a").hint("shuffle_hash")
        .join(banded.as("b").hint("shuffle_hash"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
        .select(lit(numHashes / r).as("bands"), lit(r).as("rows"),
          col("id1"), col("id2"))
    }.reduce(_.union(_))
    val scored = cands.join(truth, Seq("id1", "id2"), "left")
      .withColumn("jacc", coalesce(col("jacc"), lit(0.0)))
    val th = thresholds.toDF("threshold")
    val truthN = th.crossJoin(truth)
      .groupBy(col("threshold"))
      .agg(sum(when(col("jacc") >= col("threshold"), 1L).otherwise(0L)).as("n_truth"))
    val candN = th.crossJoin(scored)
      .groupBy(col("bands"), col("rows"), col("threshold"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("jacc") >= col("threshold"), 1L).otherwise(0L)).as("n_hit"))
    // a scheme with zero candidates, or an empty truth set, still gets its
    // grid rows: rebuild the full (scheme x threshold) frame and LEFT-join
    val grid = rowsGrid.map(r => (numHashes / r, r)).toDF("bands", "rows").crossJoin(th)
    grid
      .join(candN, Seq("bands", "rows", "threshold"), "left")
      .join(truthN, Seq("threshold"), "left")
      .select(col("bands"), col("rows"), col("threshold"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("precision", when(col("n_cand") === 0, lit(null).cast(DoubleType))
        .otherwise(round(col("n_hit").cast(DoubleType) / col("n_cand"), 6)))
      .withColumn("recall", when(col("n_truth") === 0, lit(null).cast(DoubleType))
        .otherwise(round(col("n_hit").cast(DoubleType) / col("n_truth"), 6)))
      .orderBy(col("rows"), col("threshold"))
  }

  /** Duplicated-span REMOVAL (X125) — the rewrite half of Lee et al.
    * 2107.06499's ExactSubstr dedup, composing with [[dupSpans]] (the
    * detection half): cut every span's tokens out of every document and
    * re-join the survivors, emitting
    * `(doc_id, clean_text, n_tokens, n_removed)`. Every OCCURRENCE of a
    * duplicated span is removed (the paper's ExactSubstr policy — unlike
    * cluster dedup there is no canonical copy to keep; §4.2); docs with
    * no spans pass through with n_removed = 0, and a fully-duplicated
    * doc survives as an empty string (count it, don't drop it — the
    * caller decides the empty-doc policy).
    *
    * Scale shape: spans collapse to a per-doc array via one doc-keyed
    * aggregate and LEFT-join back to the docs; the cut itself is a
    * per-row `filter`/`exists` over the token array. The span side
    * BROADCASTS (plan-audited) — spans exist only for docs with
    * duplication and carry no text — so the corpus's token arrays never
    * leave their scan partitions. If a pathological corpus produces a
    * span table past the broadcast threshold, the join degrades to a
    * doc-keyed shuffle that moves the token arrays once — inherent to
    * any rewrite (the text must meet its spans), not a plan bug. */
  def cutSpans(docs: DataFrame, spans: DataFrame, idCol: String,
      text: Column): DataFrame = {
    val spanArr = spans
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("span_start"), col("span_end")))).as("__spans"))
    val toks = col("__toks")
    val inSpan = (pos: Column) => exists(col("__spans"),
      s => pos >= s.getField("span_start") && pos < s.getField("span_end"))
    val kept = filter(zip_with(toks, sequence(lit(0), size(toks) - 1),
        (t, p) => struct(t.as("t"), p.as("p"))),
      x => !inSpan(x.getField("p").cast(LongType)))
    docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .join(spanArr, Seq("doc_id"), "left")
      .withColumn("__spans", coalesce(col("__spans"),
        array().cast(ArrayType(new StructType()
          .add("span_start", LongType).add("span_end", LongType)))))
      .select(col("doc_id"),
        array_join(transform(kept, x => x.getField("t")), " ").as("clean_text"),
        size(toks).cast(LongType).as("n_tokens"),
        (size(toks) - size(kept)).cast(LongType).as("n_removed"))
  }

  /** Quality-driven canonical selection per near-dup cluster (X123):
    * rank every cluster member by an external quality score and keep the
    * BEST one — the survivor policy [[keepCanonical]]'s min-id rule
    * cannot express. Min-id is the right default for exact clones
    * (members are identical, pick any); for NEAR-dups the members
    * differ — one copy has the boilerplate header, one is truncated,
    * one is clean — and "which copy trains the model" should be decided
    * by quality, not by crawl order (id). The same split CCNet makes
    * between dedup and quality: cluster structurally, choose editorially.
    *
    * Input: a [[dedupGroups]] `(id, label)` frame and an `(id, score)`
    * frame. Emits one row per member: `(id, label, score, rank)` with
    * `rank = 1` the canonical pick — rank by (score DESC, id ASC), the
    * id tiebreak making exact clones degrade to min-id and the whole
    * ranking deterministic/oracle-checkable.
    *
    * Scale shape: the score join is id-keyed (both frames id-sized, no
    * text), the rank is ONE label-keyed window exchange. Downstream
    * composes like [[keepCanonical]]: survivors = rank 1 + never-paired
    * docs; removals = rank > 1 rows, each explainable by its (label,
    * score) audit pair. */
  def canonicalByQuality(groups: DataFrame, scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("label"))
      .orderBy(col("score").desc, col("id").asc)
    groups.join(scores, Seq("id"))
      .select(col("id"), col("label"), col("score"),
        row_number().over(w).cast(LongType).as("rank"))
  }

  /** Contrastive (anchor, positive) pair mining over near-dup clusters —
    * the training-pair generation step for embedding/reranker models:
    * every near-dup component yields its canonical doc (the min-id label,
    * [[dedupGroups]] convention) as the anchor and up to `k` other
    * members as positives. Input is a [[dedupGroups]] (id, label) frame;
    * singleton components (id == label only) yield nothing.
    *
    * Emits `(anchor_id, positive_id, rank)`.
    *
    * Scale shape: one window keyed by the label with
    * [[Curation.capPerKey]]'s partial WindowGroupLimit — per-component
    * pair count is capped at k BEFORE the exchange, so a pathological
    * mega-cluster cannot flood the output. */
  def contrastivePairs(clusters: DataFrame, k: Int = 3): DataFrame =
    Curation.capPerKey(clusters.filter(col("id") =!= col("label")),
        col("label"), k, col("id").asc)
      .select(col("label").as("anchor_id"), col("id").as("positive_id"),
        col("rn").as("rank"))

  /** Per-key exact-duplicate mass report — the dedup dashboard a curation
    * pipeline publishes per source/language/snapshot: how many documents,
    * how many distinct contents, how much intra-key duplicate mass, and
    * how many contents also appear under OTHER keys (mirror/syndication
    * signal). Drives the decision of where to spend the expensive
    * near-dup passes.
    *
    * Emits `(key, n_docs, n_distinct_fp, intra_dup_docs, n_cross_fps)`.
    *
    * Scale shape: fingerprints only (16-byte md5 prefix) — one exchange
    * on (key, fp) with map-side combine, a second tiny one on fp over the
    * already-collapsed per-key rows; document bodies never shuffle. */
  def dedupReport(docs: DataFrame, key: Column, idCol: String,
      text: Column): DataFrame = {
    val staged = docs.select(key.as("key"), col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(text).as("fp"))
    val perKeyFp = staged.groupBy(col("key"), col("fp")).agg(count(lit(1)).as("n"))
    val fpKeys = perKeyFp.groupBy(col("fp")).agg(count(lit(1)).as("nk"))
    perKeyFp.join(fpKeys, Seq("fp"))
      .groupBy(col("key"))
      .agg(
        sum(col("n")).cast(LongType).as("n_docs"),
        count(lit(1)).as("n_distinct_fp"),
        sum(col("n") - 1).cast(LongType).as("intra_dup_docs"),
        count(when(col("nk") > 1, 1)).as("n_cross_fps"))
  }

  // ---- split leakage audit ----------------------------------------------

  /** Train/eval leakage audit: after a deterministic hash split
    * ([[graft.util.Sampling.hashSplit]]), find val/test documents whose
    * content fingerprint ([[TextAnalysis.fingerprint]], normalized md5)
    * also appears in the `trainSplit` — exact-duplicate leakage across
    * the split boundary, the eval-integrity check a pipeline runs BEFORE
    * trusting a benchmark number. (The split hashes the doc ID, dedup
    * hashes the CONTENT; ids differ while content repeats, so splitting
    * before dedup leaks — this op measures exactly that.)
    *
    * Emits one row per leaked document: `(doc_id, split, train_id)` with
    * `train_id` = the smallest matching train document.
    *
    * Scale shape: one fingerprint-keyed exchange; the train fingerprint
    * table is MIN-collapsed per fp before the join. */
  def splitLeakage(docs: DataFrame, idCol: String, text: Column,
      fractions: Seq[(String, Double)], trainSplit: String = "train",
      salt: String = ""): DataFrame = {
    require(fractions.exists(_._1 == trainSplit),
      s"fractions must contain the train split '$trainSplit'")
    val withSplit = graft.util.Sampling.hashSplit(
      docs.select(col(idCol), TextAnalysis.fingerprint(text).as("__fp")),
      col(idCol), fractions, salt)
    val train = withSplit.filter(col("split") === trainSplit)
      .groupBy(col("__fp")).agg(min(col(idCol)).as("train_id"))
    withSplit.filter(col("split") =!= trainSplit)
      .join(train, Seq("__fp"))
      .select(col(idCol), col("split"), col("train_id"))
  }

  // ---- semantic dedup (cluster-then-prune) ------------------------------

  /** SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    * partition the corpus into semantic clusters (nearest centroid by max
    * dot product — the [[Ann.ivfAssign]] convention, first-max tie-break),
    * then mark a row as a duplicate when SOME lower-id member of the SAME
    * cluster sits within cosine >= `tau` of it. Keeping the lowest id per
    * near-dup relation is this engine's deterministic stand-in for the
    * paper's keep-one-exemplar rule (the paper keeps the member farthest
    * from the centroid; any single-survivor rule dedups equally — ours is
    * reproducible across engines).
    *
    * Emits `(vec_id, cluster, is_dup)` for every input row.
    *
    * Scale shape: clustering exists precisely so the O(N²) pair space
    * shrinks to Σ per-cluster squares — the pair join keys on the cluster
    * id and only same-cluster vectors ever meet. Vectors do cross that
    * one exchange (the cosine needs them); for clusters still too hot,
    * compose with [[embeddingNearDups]]' sign-bit banding INSIDE the
    * cluster (band key = cluster + sign bits) before the exact verify. */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Float]], tau: Double): DataFrame = {
    val assigned = Ann.ivfAssign(embs, vecCol, centroids)
      .select(col(idCol).as("vec_id"), col("ivf_list").as("cluster"),
        col(vecCol).as("v"))
    // ids-only out of the pair join: the surviving dup set is a projection
    // of b's id, so a's vector never leaves its exchange partition twice
    val dupIds = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .filter(VectorFunctions.vecCosine(col("a.v"), col("b.v")) >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assigned
      .join(dupIds.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
      .withColumnRenamed("vec_id", idCol)
  }

  /** Cross-source duplication matrix (X143) — WHERE the duplicate mass
    * lives, pairwise: for every pair of sources, how many exact content
    * fingerprints they share, and how many documents on each side carry
    * a fingerprint the other source also has. The matrix is the
    * mixture-design diagnostic behind per-source dedup policy (two
    * mirrors of one crawl show up as a near-total row; an eval source
    * sharing mass with a train source is the X56 leakage signal at
    * source grain) — [[graft.operators.Dedup.exactDupGroups]] says HOW
    * MUCH is duplicated, this says BETWEEN WHOM.
    *
    * Returns (source_a, source_b, n_shared_fps, docs_a, docs_b) with
    * source_a < source_b; fingerprint pairs appearing only within one
    * source are absent (that is [[exactDupGroups]]'s row).
    *
    * Scale shape: one (fp, source) aggregate over the corpus (map-side
    * partials collapse each task to its distinct fp×source cells), then
    * the [[containmentPairs]] in-group pair discipline — pairs generate
    * INSIDE each fingerprint's sorted source list (bounded by the source
    * count, not the corpus), and the final aggregate is sources² rows.
    * Text never shuffles; only 16-hex fingerprints and source keys do. */
  def crossSourceDupMatrix(docs: DataFrame, idCol: String, text: Column,
      source: Column): DataFrame =
    crossSourceMatrix(
      docs.select(TextAnalysis.fingerprint(text).as("fp"), source.as("src")),
      "fp", "src")

  /** The fingerprint-grain core of [[crossSourceDupMatrix]], over ANY
    * (fp, source) postings frame — one row per (document, fingerprint)
    * occurrence. Feeding whole-document fingerprints gives the exact-dup
    * matrix; feeding [[winnowedSketch]] postings gives the SHARED
    * N-GRAM MASS matrix (which sources quote/boilerplate each other,
    * visible even when no whole document repeats); [[lshBandKeys]]
    * postings give the near-dup candidate-mass matrix. Same output and
    * scale shape as the convenience wrapper. */
  def crossSourceMatrix(posts: DataFrame, fpCol: String,
      srcCol: String): DataFrame = {
    val f = posts
      .select(col(fpCol).as("fp"), col(srcCol).as("__src"))
      .groupBy(col("fp"), col("__src")).agg(count(lit(1)).as("__cnt"))
    val lists = f.groupBy(col("fp"))
      .agg(sort_array(collect_list(struct(col("__src"), col("__cnt")))).as("__s"))
      .filter(size(col("__s")) >= 2)
    val s = col("__s")
    val pairGen = flatten(transform(s, (x, i) =>
      transform(slice(s, i + 2, size(s) - i - 1),
        y => struct(x.getField("__src").as("a"), y.getField("__src").as("b"),
          x.getField("__cnt").as("ca"), y.getField("__cnt").as("cb")))))
    lists
      .select(explode(pairGen).as("__p"))
      .groupBy(col("__p.a").as("source_a"), col("__p.b").as("source_b"))
      .agg(count(lit(1)).as("n_shared_fps"),
        sum(col("__p.ca")).as("docs_a"), sum(col("__p.cb")).as("docs_b"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
