package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions over the real testdata — the properties that
  * make queries scale (pushdown, pruning, broadcast, TakeOrdered instead
  * of global sort/limit funnels) must hold structurally, not just produce
  * right answers at toy sizes.
  *
  * Notes: scan pushdown is asserted via FileSourceScanExec.metadata (the
  * toString truncates long filter lists); codegen via the FINAL adaptive
  * plan (AQE only materializes WholeStageCodegen stages after execution).
  */
class PlanAuditSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def df(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  private def scans(name: String): Seq[Map[String, String]] =
    df(name).queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s.metadata }

  private def staticPlan(name: String): String =
    df(name).queryExecution.sparkPlan.toString

  private def finalPlan(name: String): String = {
    val frame = df(name)
    frame.collect()
    frame.queryExecution.executedPlan.toString
  }

  test("point lookup pushes the predicate into the parquet scan (S2)") {
    val pushed = scans("q02_point_lookup").map(_("PushedFilters")).mkString
    assert(pushed.contains("EqualTo(o_orderkey,4242"), pushed)
  }

  test("range scan pushes both bounds and the quantity filter (P2)") {
    val pushed = scans("q04_range_scan").map(_("PushedFilters")).mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThan(l_quantity,45.0)"), pushed)
  }

  test("projection prunes the scan to selected columns only (P1)") {
    val read = scans("q05_like_scan").map(_("ReadSchema")).mkString
    assert(read.contains("p_partkey") && read.contains("p_name") && read.contains("p_brand"), read)
    assert(!read.contains("p_retailprice") && !read.contains("p_comment"),
      s"unused columns must not be read: $read")
  }

  test("search: broadcasts, TakeOrderedAndProject top-k, no single-partition GlobalLimit") {
    val p = staticPlan("q37_search_e2e")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must plan as a distributed top-k heap:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate/rerank joins must broadcast the small side:\n$p")
    assert(!p.contains("GlobalLimit"), s"no global-limit funnel in the default plan:\n$p")
  }

  test("search hamming stage reads only sketch columns, never the wide vector (column pruning)") {
    // build the stage-2 frame the way SearchEngine does and inspect its scan
    val emb = SparkEntry.embStore(spark, sf)
    val stage2 = emb.select(org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("binary_code"))
    val read = stage2.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s.metadata("ReadSchema") }.mkString
    assert(read.contains("vec_id"), read)
    assert(!read.contains("label"), s"pruned scan must not read unused columns: $read")
  }

  test("small-dim joins broadcast; aggregation is partial-then-final; codegen spans exist") {
    // static plan prints the full tree (AQE's final plan collapses
    // materialized stages into references, hiding the partial agg)
    val s = staticPlan("q10_revenue_by_nation")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(s.contains("partial_sum"), "map-side combine must run before the shuffle")
    val p = finalPlan("q10_revenue_by_nation")
    // WholeStageCodegenExec prints as "*(id) Operator" in tree strings
    assert(p.contains("*("), s"agg pipeline must stay inside codegen:\n$p")
  }

  test("dedup banding plan: hash aggregate on the band key, no sort-based fallback") {
    val p = finalPlan("q43_band_buckets")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("top-k orders plan as TakeOrderedAndProject, not Sort+GlobalLimit (T1/T2)") {
    val p = staticPlan("q13_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("as-of join plans as one window pass — no cartesian/range-join blowup (X20)") {
    val p = finalPlan("q62_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not expand the pair space:\n$p")
    assert(p.contains("Window"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("last("),
      s"running last-carry expected:\n$p")
  }

  test("packing never plans a global single-partition window (X26)") {
    val q = SparkEntry.queries("q64_packing")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"prefix sum must use the two-pass scheme, not a window:\n$p")
  }

  test("tfidf: one exchange feeds both the tf aggregate and the top-N window (X19)") {
    // the doc_id repartition must satisfy BOTH the (doc_id, term) agg and
    // the per-doc window: exactly one real doc_id Exchange in the final
    // plan (the df branch reads it back via ReusedExchange), and the
    // top-N cut pushed below the sort as WindowGroupLimit
    val finalSection = finalPlan("q60_tfidf").split("== Initial Plan ==")(0)
    val real = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(doc_id") && !l.contains("ReusedExchange"))
      .size
    assert(real == 1, s"expected one doc_id exchange, found $real:\n$finalSection")
    assert(finalSection.contains("ReusedExchange"),
      s"df branch must reuse the postings exchange:\n$finalSection")
    assert(finalSection.contains("WindowGroupLimit"),
      s"top-N must prune below the window sort:\n$finalSection")
  }

  test("source cap: partial WindowGroupLimit caps per-key rows BEFORE the exchange (X30)") {
    val p = finalPlan("q71_source_cap")
    // the scale property: each map task keeps at most n rows per key, so
    // the shuffle moves O(n·keys) rows, not the whole corpus
    assert(p.contains("row_number(), 20, Partial"),
      s"expected a map-side partial WindowGroupLimit:\n$p")
    assert(p.contains("row_number(), 20, Final"), p)
    val read = scans("q71_source_cap").map(_("ReadSchema")).mkString
    assert(!read.contains("text"), s"cap must not read the wide text column: $read")
  }

  test("corpus-freq score: postings exchange reused across tf and ctf branches (X29)") {
    val finalSection = finalPlan("q70_corpus_freq").split("== Initial Plan ==")(0)
    assert(finalSection.contains("ReusedExchange"),
      s"ctf branch must reuse the postings exchange, not re-explode the corpus:\n$finalSection")
    assert(finalSection.contains("partial_sum"),
      s"per-doc sums must map-side combine:\n$finalSection")
    assert(!finalSection.contains("CartesianProduct"), finalSection)
  }

  test("balanced sample: rate table broadcasts; the corpus side is never re-shuffled (X36)") {
    val finalSection = finalPlan("q75_balanced_sample").split("== Initial Plan ==")(0)
    assert(finalSection.contains("BroadcastHashJoin"),
      s"per-key rates are one row per source — must broadcast:\n$finalSection")
    // every shuffle in the plan belongs to the rate branch (keyed on __k /
    // the final output sort): the corpus rows themselves never ride a hash
    // exchange carrying doc_id
    val docExchanges = finalSection.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("doc_id")).toList
    assert(docExchanges.isEmpty,
      s"corpus side re-shuffled:\n${docExchanges.mkString("\n")}")
  }

  test("incremental dedup: bloom rides as a subquery, verify is an anti-join, no cartesian (X41)") {
    val p = staticPlan("q79_incremental_dedup")
    assert(p.contains("Subquery") || p.contains("subquery"),
      s"bloom sketch must ride as a scalar subquery:\n$p")
    assert(p.contains("LeftAnti"), s"exact verify must be an anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("top terms: distributed top-k heap over the term agg, no full vocab sort (X39)") {
    val p = staticPlan("q78_top_terms")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocabulary head must be a top-k heap, not Sort+GlobalLimit:\n$p")
  }

  test("shard shuffle: scan prunes to the id column only (X31)") {
    val read = scans("q72_shard_shuffle").map(_("ReadSchema")).mkString
    assert(read.contains("doc_id") && !read.contains("text"),
      s"shard assignment must not read document payloads: $read")
  }

  test("sessionize: both window passes and the session agg share ONE user exchange (X34)") {
    val finalSection = finalPlan("q73_sessionize").split("== Initial Plan ==")(0)
    val userExchanges = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(user_id") && !l.contains("ReusedExchange"))
      .size
    assert(userExchanges == 1,
      s"lag flag, running session number and the agg must share one exchange:\n$finalSection")
  }

  test("decontamination: no inferred-filter shingle recompute below the explode (X28)") {
    val p = finalPlan("q66_decontaminate")
    // the 18s-class regression shape: predicate pushdown inlines the
    // tokenize->shingle chain into a scan-level filter. The tokenizer must
    // appear only in projections (2 sides), never inside Filter conditions.
    val filterLines = p.linesIterator.filter(_.contains("Filter ")).mkString("\n")
    assert(!filterLines.contains("split(lower"),
      s"tokenizer inlined into a filter — InferFiltersFromGenerate regression:\n$filterLines")
  }

  test("admin page: TakeOrderedAndProject with offset, posts broadcast — no sort funnel (T7/T9)") {
    val p = staticPlan("q84_admin_page")
    assert(p.contains("TakeOrderedAndProject") && p.contains("offset=25"),
      s"pagination must plan as a distributed heap with offset, not Sort+GlobalLimit:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the posts listing slice must broadcast:\n$p")
  }

  test("image roundtrip: payload bytes never cross an exchange (X22)") {
    // the text shuffle (parallelizing the encode) happens BEFORE payloads
    // exist; the final sort exchange carries only the 4 decoded columns —
    // no Exchange may ever move the binary payload at any scale. Checked
    // on the exchange INPUT attributes (plan strings only print
    // partitioning expressions, so a toString grep cannot fail).
    val plan = df("q85_image_roundtrip").queryExecution.sparkPlan
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(a => (a.name, a.dataType))
    }
    assert(shuffled.nonEmpty,
      "expected the pre-render repartition exchange in the plan")
    val binCols = shuffled.flatten.collect {
      case (n, org.apache.spark.sql.types.BinaryType) => n }
    assert(binCols.isEmpty, s"an exchange is moving binary payload bytes: $binCols")
    assert(staticPlan("q85_image_roundtrip").contains("RoundRobinPartitioning"),
      "the pre-render repartition must spread the encode across cores")
  }

  // The new-op audits drive the operator on a repartitioned input (the
  // sf0.001 parquet is one split, whose SinglePartition satisfies every
  // required distribution — no exchange would be planned at all) and
  // assert on the PREPARED plan: EnsureRequirements inserts
  // distribution-driven exchanges after sparkPlan, so only executedPlan
  // (AQE's initial tree, pre-execution) shows them.

  private def prepPlan(frame: DataFrame): String =
    frame.queryExecution.executedPlan.toString

  test("line dedup: census shuffles the md5 line key, never the raw line; map-side combine (X47)") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
      .select(col("doc_id"), concat_ws("\n", col("text"), col("source")).as("text"))
    val p = prepPlan(operators.Dedup.lineDedup(docs, "doc_id", col("text")))
    // the duplicate-line census exchange must be keyed by the 16-byte md5
    // prefix (lk) with a partial aggregate below it — a raw-line key would
    // put every boilerplate body on the wire once per occurrence
    assert(p.contains("hashpartitioning(lk"),
      s"census exchange must key on the md5 line prefix:\n$p")
    assert(p.contains("partial_count"),
      s"the distinct-doc census needs a map-side partial below the exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the flagging join:\n$p")
  }

  test("semantic dedup: pair join keys on the cluster id, no cartesian (X48)") {
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet(s"$sf/embeddings.parquet").repartition(4)
    val cents = Seq(Array.fill(64)(0.1f), Array.fill(64)(-0.1f))
    val p = prepPlan(operators.Dedup.semanticDedup(embs, "vec_id", "embedding", cents, 0.4))
    // SemDeDup's whole point: candidates form inside coarse clusters, so
    // the self-join must plan as an equi-join KEYED by the cluster id —
    // broadcast at this toy size, cluster-keyed exchange at scale; either
    // way the cosine runs only inside matching clusters
    assert(p.contains("hashpartitioning(cluster") || p.contains("BroadcastHashJoin [cluster"),
      s"pair join must be an equi-join on the cluster id:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pairing must never fall back to all-pairs:\n$p")
  }

  test("bigram table: (w1,w2) agg map-side combines; per-head top-k stays a partial window cut (X52)") {
    val p = finalPlan("q95_bigram_table")
    // the shuffle carries combined (w1, w2, count) rows, not raw bigrams,
    // and each map task pre-cuts to k rows per head before the exchange
    assert(p.contains("partial_count"),
      s"bigram counts must map-side combine below the exchange:\n$p")
    assert(p.contains("row_number(), 3, Partial"),
      s"per-head top-k must pre-cut map-side (WindowGroupLimit Partial):\n$p")
  }

  test("winnow overlap: postings carry 8-byte fps, pair join is an fp equi-join (X55)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val p = prepPlan(operators.Dedup.winnowedOverlap(docs, "doc_id", col("text")))
    assert(p.contains("hashpartitioning(fp") || p.contains("SortMergeJoin [fp")
      || p.contains("BroadcastHashJoin [fp"),
      s"the sketch self-join must key on the fingerprint:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"sketch pairing must never fall back to all-pairs:\n$p")
  }

  test("matryoshka funnel: both stages are distributed top-k heaps, rerank joins by id (X61)") {
    val p = staticPlan("q104_matryoshka_search")
    assert("TakeOrderedAndProject".r.findAllIn(p).length == 2,
      s"prefix stage AND rerank must each plan as a top-k heap:\n$p")
    assert(!p.contains("GlobalLimit"), s"no single-partition limit funnel:\n$p")
  }

  test("mixture sample: single source-keyed exchange, literal budget map — no join at all (X49)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val frame = operators.Curation.mixtureSample(docs, col("source"), "doc_id",
      col("n_chars"), Seq("src0" -> 100L, "src1" -> 50L))
    val p = prepPlan(frame)
    // exactly one hash exchange (the window's source partition); the
    // audit input's own RoundRobin repartition is the only other exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"mixture sampling is ONE window pass -> one hash exchange:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"the hash exchange must key on the source (the window partition):\n$p")
    assert(!p.contains("Join"),
      s"budgets ride as a literal map expression, never a join:\n$p")
  }

  test("lm score: corpus scanned once, count table pinned for all three consumers (X64)") {
    val p = staticPlan("q107_lm_score")
    // scored-side generate is the ONLY parquet scan; the model's count
    // join, head aggregate, and V aggregate all read the pinned table
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"reference-model consumers must read the checkpointed count table, not rescan:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).length == 3,
      s"count join + head agg + V agg = three reads of the pinned table:\n$p")
    assert(p.contains("partial_sum(cast(__lp"),
      s"per-doc mean must map-side combine:\n$p")
  }

  test("bm25: one doc-keyed pass, stats broadcast, top-k heap — no postings joins (X76)") {
    val p = staticPlan("q118_bm25")
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"per-doc tf/dl and corpus stats must come from one pass (exchange reuse), not per-term scans:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"the cut must be a distributed heap:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the single stats row must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no postings joins in the BM25 plan:\n$p")
  }

  test("session traces: ONE user exchange serves sessionize windows and the trace agg (X78)") {
    import org.apache.spark.sql.functions.col
    val ev = SparkEntry.events(spark, sf)
    val frame = operators.Sessionize.sessionTraces(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), 1800000000L)
    val p = prepPlan(frame)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"window passes and the (user, session) aggregation must share one exchange:\n$p")
  }

  test("cdc chunks: ONE doc exchange serves both windows and the chunk aggregate (X87)") {
    import org.apache.spark.sql.functions.col
    val frame = operators.TextAnalysis.cdcChunks(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", col("text"))
    val p = prepPlan(frame)
    // hash(doc_id) clusters (doc_id, chunk_no) too: the prefix-count
    // window, the in-chunk rank window, and the per-chunk aggregate must
    // all ride the same exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"cdcChunks must plan exactly one doc-keyed exchange:\n$p")
  }

  test("ngram diversity: ONE corpus scan feeds all three gram orders (X92)") {
    import org.apache.spark.sql.functions.col
    val frame = operators.CorpusStats.ngramDiversity(
      spark.read.parquet(s"$sf/documents.parquet"), col("source"), col("text"))
    val p = frame.queryExecution.sparkPlan.toString
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"all gram orders must explode from one staged scan:\n$p")
  }

  test("jl projection: shuffle-free per-row map, matrix broadcast not inlined (X95)") {
    val frame = operators.Ann.jlProject(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding", 64, 16)
    val p = prepPlan(frame)
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(p.contains("jl_project"), s"expected the broadcast codegen kernel:\n$p")
  }

  test("matryoshka stage 1 over a stored prefix column never reads the full vector (X61)") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_mrl_audit").toString
    val store = new sources.EmbeddingStore(spark, s"$dir/emb", numBuckets = 4,
      prefixDims = Some(2))
    store.bulkLoad(
      spark.range(1, 33).select(col("id").as("post_id"), lit(0).as("sequence_no"),
        org.apache.spark.sql.functions.array(
          (col("id") % 7).cast("float"), (col("id") % 5).cast("float"),
          (col("id") % 3).cast("float"), (col("id") % 2).cast("float")).as("vector"),
        lit("m").as("vector_type")))
    val frame = operators.Ann.matryoshkaTopK(store.read(), "id", "vector",
      Array(1f, 2f, 3f, 4f), prefixDims = 2, candidates = 8, k = 4,
      prefixCol = Some("vector_prefix"))
    val metas = frame.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s.metadata("ReadSchema") }
    // stage 1: (id, vector_prefix) only; rerank: the full vector
    assert(metas.exists(m => m.contains("vector_prefix") && !m.contains("vector:")),
      s"stage-1 scan must prune the full vector column:\n${metas.mkString("\n")}")
    assert(metas.exists(_.contains("vector:")),
      s"the rerank stage still needs the full vector:\n${metas.mkString("\n")}")
    // and the prefix path returns the same rows as the slice path
    val viaSlice = operators.Ann.matryoshkaTopK(store.read(), "id", "vector",
      Array(1f, 2f, 3f, 4f), 2, 8, 4).collect().toSeq
    assert(frame.collect().toSeq == viaSlice, "stored prefix changed the results")
  }

  test("pack slices: per-row generate over the assignment frame, no new exchange (X109)") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val asg = operators.Packing.packAssignments(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"),
          asize(operators.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", 2048L)
    val p = prepPlan(operators.Packing.packSlices(asg, "doc_id", "n_tokens", 2048L))
    assert(!p.contains("Exchange"),
      s"the cut-list expansion must not add an exchange:\n$p")
  }

  test("oov rate: vocab rides a broadcast join, corpus side never sort-merges (X110)") {
    import org.apache.spark.sql.functions.col
    val frame = operators.CorpusStats.oovRate(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", col("text"), 50)
    val p = prepPlan(frame)
    assert(p.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a corpus-sized shuffle join defeats the bounded-vocab design:\n$p")
  }

  test("coverage histogram: bucket equi-join, never a cartesian product (X98)") {
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val frame = operators.Ann.coverageHistogram(
      e.filter(col("vec_id") % 5 === 0), e.filter(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", bits = 8)
    val p = prepPlan(frame)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"the NN pass must join on the sign bucket, not cross:\n$p")
  }

  test("bpe pairs: vocab census before char explode, top-k heap not global sort (X90)") {
    import org.apache.spark.sql.functions.col
    val frame = operators.TextAnalysis.bpePairStats(
      spark.read.parquet(s"$sf/documents.parquet"), col("text"))
    val p = prepPlan(frame)
    // census exchange + pair exchange, nothing else; the k-cut must be a
    // distributed heap
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      s"census + pair aggregation = exactly two exchanges:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must heap, not sort:\n$p")
  }

  test("embedding health: partials collapse map-side, one dim exchange, no vector shuffle (X88)") {
    val frame = operators.Ann.embeddingHealth(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding")
    val p = prepPlan(frame)
    assert("Exchange hashpartitioning\\(dim".r.findAllIn(p).length == 1,
      s"one dim-keyed exchange of O(tasks*dim) partials:\n$p")
    assert(p.contains("partial_count"),
      s"per-dim aggregation must map-side combine before the exchange:\n$p")
  }

  test("datasheet: one corpus scan, one key exchange for aggregate + majority window (X80)") {
    val p = staticPlan("q122_datasheet")
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"per-row signals must not rescan per consumer:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      s"the key repartition must satisfy the aggregate, lang counts, and window:\n$p")
  }

  test("dsir: one scored-side generate, two pinned models, no extra corpus pass (X65)") {
    val p = staticPlan("q108_dsir_weights")
    // documents is read once for the scored bigrams and once for the
    // target filter's model build... the target model build happens at
    // checkpoint time, so the RESULT plan sees exactly one parquet scan
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"both models must come from pinned count tables:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).length == 6,
      s"2 models x (count join + head agg + V agg) = six pinned-table reads:\n$p")
    assert(p.contains("partial_count(1)"),
      s"per-doc aggregation must map-side combine:\n$p")
  }

  test("rollup datasheet: one Expand, group-sized exchanges, text never shuffles (X116)") {
    val scanned = scans("q158_rollup_datasheet").map(_("ReadSchema")).mkString
    assert(scanned.contains("text") && scanned.contains("lang") && scanned.contains("source"),
      scanned)
    assert(!scanned.contains("doc_id") && !scanned.contains("n_chars"),
      s"rollup needs only text/lang/source: $scanned")
    val finalSection = finalPlan("q158_rollup_datasheet").split("== Initial Plan ==")(0)
    assert("Expand ".r.findAllIn(finalSection).length == 1,
      s"rollup is ONE map-side Expand:\n$finalSection")
    val ex = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
      .toList
    assert(ex.size <= 2,
      s"group-sized exchanges only (agg + count-distinct re-agg):\n$finalSection")
    assert(!ex.exists(_.contains("text#")),
      s"exchanges carry signals, never the text payload:\n$ex")
  }

  test("span corruption: windows and reassembly share ONE doc exchange (X117)") {
    val finalSection = finalPlan("q159_span_corrupt").split("== Initial Plan ==")(0)
    val real = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(doc_id") && !l.contains("ReusedExchange"))
      .size
    assert(real == 1,
      s"lag/sum windows + per-doc aggregate = one doc_id exchange, found $real:\n$finalSection")
    assert(!finalSection.contains("Exchange SinglePartition") || 
      finalSection.split("Exchange SinglePartition").length <= 2,
      s"no global funnel beyond the final orderBy:\n$finalSection")
  }

  test("length batching: ONE (cap, shard) exchange serves both windows (X118)") {
    val finalSection = finalPlan("q160_length_batches").split("== Initial Plan ==")(0)
    val real = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(bucket_cap") && !l.contains("ReusedExchange"))
      .toList
    assert(real.size == 1,
      s"row_number + batch_max must share the (cap, shard) exchange:\n$finalSection")
    assert(real.head.contains("shard"),
      s"the exchange must carry the shard key (the parallelism lever): ${real.head}")
    val scanned = scans("q160_length_batches").map(_("ReadSchema")).mkString
    assert(!scanned.contains("lang") && !scanned.contains("source"),
      s"batching reads only id + text: $scanned")
  }

  test("score calibration: rank window + moments share one source exchange (X119)") {
    val finalSection = finalPlan("q161_score_calibrate").split("== Initial Plan ==")(0)
    val real = finalSection.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning(source") && !l.contains("ReusedExchange"))
      .size
    assert(real == 1,
      s"window and moment aggregate must share ONE source exchange, found $real:\n$finalSection")
    // Both the rank window and the whole-partition moment windows stack on
    // that single exchange: no join, no second shuffle, nothing to re-use.
    assert(!finalSection.contains("Join"),
      s"moments are window aggregates over the same partitioning, not a join-back:\n$finalSection")
  }

  test("containment: chain evaluated <= 2x, in-group pairs; text never shuffles (X120)") {
    val q = SparkEntry.queries("q162_containment")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the tokenize->shingle->hash chain feeds exactly the census and the
    // postings shuffle — the 6x re-derivation (size-lookup joins with the
    // chain pushed into scan filters) must not come back
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"the shingle chain must be evaluated at most twice (census + postings):\n$p")
    assert(p.contains("collect_list"),
      s"candidate pairs must be generated in-group from bounded df lists:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no postings self-join — pairs come from the list aggregate:\n$p")
    // Under AQE the ShuffleExchangeExec nodes live inside materialized query
    // stages beneath AdaptiveSparkPlanExec, which `.collect` on the wrapper
    // does not traverse — audit the printed final plan instead.
    val exchangeLines = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toList
    assert(exchangeLines.nonEmpty,
      s"postings census and pair aggregate must shuffle on hash keys:\n$p")
    assert(exchangeLines.size <= 3,
      s"only the postings repartition, the census, and the (id1,id2) pair " +
        s"aggregate may shuffle: $exchangeLines")
    assert(exchangeLines.forall(l => !l.contains("text")),
      s"exchanges carry ids/hashes only, never document text: $exchangeLines")
  }

  test("dup spans: census discipline, one doc-keyed island exchange; text never shuffles (X121)") {
    val q = SparkEntry.queries("q164_dup_spans")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"the window chain feeds only the census and the postings shuffle:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the census join must be co-partitioned, not sort-merge over fresh exchanges:\n$p")
    val exchangeLines = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toList
    assert(exchangeLines.size <= 3,
      s"only the postings repartition, the census, and the doc-keyed island " +
        s"merge may shuffle: $exchangeLines")
    assert(exchangeLines.forall(l => !l.contains("text")),
      s"exchanges carry (doc_id, pos, hash) only, never text: $exchangeLines")
    assert(exchangeLines.count(_.contains("doc_id")) <= 1,
      s"lag/sum windows and the span aggregate share ONE doc exchange: $exchangeLines")
  }

  test("cut spans: span side broadcasts; token arrays stay in scan partitions (X125)") {
    val q = SparkEntry.queries("q169_cut_spans")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"),
      s"the per-doc span arrays must broadcast to the corpus, not shuffle it:\n$p")
    val exchangeLines = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toList
    assert(exchangeLines.forall(l => !l.contains("text#")),
      s"no hash exchange may carry document text: $exchangeLines")
  }

  // ---- approx-path plan shapes (X58/X66/X92/X104) ------------------------
  // The approx variants cannot hash-match an oracle (sketches), so their
  // SCALE promises are pinned structurally instead: each must deliver the
  // plan shape its scaladoc sells, not just a tolerable answer.

  test("adaptive cutoff approx: sketch partials, broadcast cut, no corpus exchange (X58)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val p = prepPlan(operators.Curation.adaptiveQualityCutoff(
      docs, "doc_id", col("text"), keepFrac = 0.8, approx = true))
    assert(p.contains("percentile_approx"),
      s"the cutoff must come from the GK sketch:\n$p")
    assert(p.contains("partial_percentile_approx"),
      s"sketch state must combine map-side (constant-size partials):\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"one single-row cut + a filter pass — the corpus itself never hash-shuffles:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the single-row cutoff must ride back as a broadcast:\n$p")
  }

  test("ppl buckets approx: no per-group sort/ntile, boundaries broadcast by value (X66)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
      .select(col("doc_id"), col("text"), col("source"))
    val exact = prepPlan(operators.Curation.pplBuckets(
      docs, docs, "doc_id", col("text"), col("source")))
    // "ntile(" not "ntile": perceNTILE_approx would match the bare word
    assert(exact.contains("ntile(3"),
      s"sanity: the exact path ranks with NTILE:\n$exact")
    val p = prepPlan(operators.Curation.pplBuckets(
      docs, docs, "doc_id", col("text"), col("source"), approx = true))
    assert(!p.contains("ntile(3"),
      s"approx buckets by VALUE comparison, never a rank window:\n$p")
    assert(p.contains("partial_percentile_approx"),
      s"per-group boundary sketches must combine map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-group cut rows must broadcast back, not shuffle the docs:\n$p")
  }

  test("ngram diversity approx: HLL partials, no gram-keyed exchange, still one scan (X92)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def exchanges(p: String) = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    val exact = operators.CorpusStats.ngramDiversity(docs, col("source"), col("text"))
      .queryExecution.executedPlan.toString
    assert(exchanges(exact).exists(_.contains("gram")),
      s"sanity: exact distinct pre-aggregates on the gram key (corpus-sized exchange):\n$exact")
    val frame = operators.CorpusStats.ngramDiversity(docs, col("source"), col("text"),
      approx = true)
    val p = frame.queryExecution.executedPlan.toString
    assert(p.contains("approx_count_distinct"),
      s"the distinct count must be the HLL sketch:\n$p")
    assert(!exchanges(p).exists(_.contains("gram")),
      s"HLL partials are constant-size per (source, n) — the gram-keyed exchange must vanish:\n$p")
    assert(exchanges(p).size == 1,
      s"one group-keyed exchange of sketch partials only:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"all gram orders still explode from one staged scan:\n$p")
  }

  test("clip recommendation approx: one dim exchange, sketch partials map-side (X104)") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet").repartition(4)
    val p = prepPlan(operators.Quantize.clipRecommendation(embs, "embedding",
      approx = true))
    assert("Exchange hashpartitioning\\(dim".r.findAllIn(p).length == 1,
      s"exact and approx share the single dim-keyed exchange:\n$p")
    assert(p.contains("partial_percentile_approx"),
      s"the per-dim sort state must collapse to a bounded map-side sketch:\n$p")
    assert(!p.contains("SortAggregate"),
      s"sketch aggregation must not fall back to sort-based agg:\n$p")
  }

  test("decontamination spans: postings-only exchanges, test side collapses to a hash set (X133)") {
    val q = SparkEntry.queries("q178_decontaminate")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("FileScan parquet".r.findAllIn(p).length <= 2,
      s"train and test sides scan once each — the shingle chain must not re-derive:\n$p")
    val exchangeLines = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toList
    assert(exchangeLines.size <= 3,
      s"train-postings repartition + test-hash distinct + doc island merge only: $exchangeLines")
    assert(exchangeLines.forall(l => !l.contains("text#")),
      s"exchanges carry (doc_id, pos, hash) postings only, never text: $exchangeLines")
    assert(exchangeLines.count(_.contains("doc_id")) <= 1,
      s"lag/sum windows and the span aggregate share ONE doc exchange: $exchangeLines")
    assert(p.contains("partial_"),
      s"the test hash-set distinct must map-side combine:\n$p")
  }

  test("tag dictionary: lexicon broadcasts, only matches reach the (doc, tag) exchange (X137)") {
    import org.apache.spark.sql.functions.col
    val frame = operators.TextAnalysis.tagDictionary(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", col("text"),
      Seq(("a", "hash"), ("b", "row scan")))
    val p = prepPlan(frame)
    assert(p.contains("BroadcastHashJoin"),
      s"the dictionary side must broadcast, never shuffle the corpus grams:\n$p")
    // exactly one hash exchange: the (doc, tag) count of the MATCHES;
    // gram postings themselves stay map-side
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"only matched (doc, tag) partial counts may shuffle:\n$p")
    assert(p.contains("partial_count"),
      s"per-(doc, tag) counts must combine map-side:\n$p")
  }

  test("cluster datasheet: top-terms cut pushed below the shuffle as WindowGroupLimit (X139)") {
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = embs.filter(col("vec_id") < 4).orderBy(col("vec_id")).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toArray).toSeq
    val assign = operators.Ann.ivfAssign(embs, "embedding", cents)
      .select(col("vec_id").as("id"), col("ivf_list").as("cluster"))
    val frame = operators.CorpusStats.clusterDatasheet(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id",
      col("text"), col("source"), assign, topTerms = 5)
    val p = prepPlan(frame)
    assert(p.contains("WindowGroupLimit"),
      s"per-cluster top-k must cut before the full term table sorts:\n$p")
    assert(!p.contains("text#") || !"Exchange[^\\n]*text#".r.findAllIn(p).hasNext,
      s"exchanges must carry postings/stats, never document text:\n$p")
  }

  test("url profile: pure per-row projection — no exchange, no UDF (X122)") {
    val q = SparkEntry.queries("q165_url_profile")(spark, sf)
    val p = prepPlan(q)
    assert(!p.contains("Exchange hashpartitioning"),
      s"normalization is a projection; only the final ORDER BY may range-shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"regexp/array functions only, no UDFs:\n$p")
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"one scan serves the whole profile:\n$p")
  }

  test("unimax plan: corpus collapses map-side before any window touches it (X150)") {
    import org.apache.spark.sql.functions.{col, size}
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val p = prepPlan(operators.Curation.uniMaxPlan(docs, col("source"),
      size(operators.TextAnalysis.tokens(col("text"))).cast("long"), 48000L, 2))
    // the ONLY corpus-width work is the per-source aggregate, and it must
    // partial map-side; the waterfill windows then run on ≤|sources| rows
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      s"per-source aggregate needs map-side partials below its exchange:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"one source-keyed exchange collapses the corpus:\n$p")
    // no join anywhere — the budget is literal arithmetic over the agg
    assert(!p.contains("Join"), s"waterfill is windows over the agg, no join:\n$p")
  }

  test("quality classifier scoring: exchange-free projection over the pinned features (X151)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val scored = operators.Curation.qualityClassifier(docs, "doc_id", col("text"),
      col("source") === "src0", dims = 8, iters = 1, lr = 0.5)
    val p = prepPlan(scored)
    // training already ran (driver-sequenced aggregates over the pin);
    // the returned frame is a pure per-row projection of the 17-byte
    // (id, label, mask) pin — no exchange, no text re-read, no UDF
    assert(p.contains("Scan ExistingRDD"),
      s"scoring must read the pinned feature frame, not re-tokenize:\n$p")
    assert(!p.contains("Exchange"),
      s"scoring is per-row logit arithmetic — nothing may shuffle:\n$p")
    assert(!p.contains("FileScan"),
      s"text must not be re-read at scoring time:\n$p")
    graft.util.Pins.release(scored)
  }

  test("audio perceptual dups: payload bytes never cross an exchange (X153)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
      .limit(40).select(col("doc_id"), col("source").as("text"))
    val media = operators.Multimodal.fromTextAsWavs(docs, "doc_id", "text")
    val frame = operators.Multimodal.audioPerceptualDups(media, 0, 4)
    val plan = frame.queryExecution.executedPlan
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(a => (a.name, a.dataType))
    }
    val binCols = shuffled.flatten.collect {
      case (n, org.apache.spark.sql.types.BinaryType) => n }
    assert(binCols.isEmpty, s"an exchange is moving WAV payload bytes: $binCols")
    // candidates must form inside (band, key) buckets, never all-pairs
    val p = plan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding join must never fall back to all-pairs:\n$p")
    graft.util.Pins.release(frame)
  }

  test("stupid backoff: count tables map-side combine; doc text never shuffles (X154)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val frame = operators.TextAnalysis.stupidBackoff(docs, docs, "doc_id", col("text"))
    val plan = frame.queryExecution.executedPlan
    val p = plan.toString
    assert(p.contains("partial_count"),
      s"tri/bi/uni counts must partial map-side below their exchanges:\n$p")
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(!shuffled.flatten.contains("text"),
      s"exchanges carry tokens and counts, never the document text: $shuffled")
  }

  test("snippets: anchor pick is a per-row fold, text never rides an exchange (X177)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(4)
    val idx = operators.TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val frame = operators.TextAnalysis.snippets(docs, "doc_id", col("text"),
      idx, Seq("sort", "merge"), window = 8)
    val p = prepPlan(frame)
    assert(!p.contains("Window"),
      s"the densest window is a higher-order fold over the hit array, not a window function:\n$p")
    val shuffled = frame.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.child.output.map(_.name)
    }
    assert(!shuffled.flatten.exists(n => n == "text" || n == "__tk"),
      s"only (doc_id, pos) postings and anchors shuffle — never text or tokens: $shuffled")
  }

  test("streaming index replay guard: corpus ids probe map-side, no corpus exchange (X176)") {
    import org.apache.spark.sql.functions.col
    import java.nio.file.Files
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = Files.createTempDirectory("graft_audit_ingest").toString
    val idx = new sources.InvertedIndex(spark, s"$dir/inv", buckets = 4)
    idx.build(docs.filter(col("doc_id") < 100), "doc_id", col("text"))
    val frame = streaming.IndexIngest.freshOnly(idx,
      docs.filter(col("doc_id") >= 100), "doc_id")
    val p = prepPlan(frame)
    // the batch-sized dropDuplicates exchange is fine; what must never
    // happen is a JOIN that shuffles the corpus-sized doclens side
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"both guard joins broadcast the batch-sized side — the doclens id scan never shuffles:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the guard must be broadcast joins:\n$p")
  }

  test("fuzzy suggest: candidates equi-join on variants, never a cross join (X183)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = prepPlan(operators.TextAnalysis.fuzzySuggest(
      docs, "doc_id", col("text"), Seq("sorrt", "mergee"), topK = 5))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the V×Q cross join must never form — candidates come from the variant equi-join:\n$p")
    assert(p.contains("variant"),
      s"the join key must be the deletion-neighborhood variant:\n$p")
  }

  test("static pruning window: rank cut plans as partial WindowGroupLimit — hot-term skew bounded map-side (X204)") {
    import org.apache.spark.sql.functions.{col, count, explode, lit, lower, row_number, split}
    import org.apache.spark.sql.expressions.Window
    // the exact frame shape prunedCopy's survivor selection builds: a
    // per-term row_number cut. InferWindowGroupLimit must insert the
    // PARTIAL group-limit below the exchange, so a stopword-class term
    // with corpus-proportional postings ships at most keepPerTerm rows
    // per map task instead of its whole list to one reducer.
    val shaped = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("term"))
          .orderBy(col("tf").desc, col("doc_id").asc)))
      .filter(col("rk") <= 50)
    val p = shaped.queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"the rank filter must infer a WindowGroupLimit:\n$p")
    assert(p.contains("Partial"),
      s"a PARTIAL group limit must sit below the exchange:\n$p")
  }

  test("batched QL/Boolean: postings pruned to the batch vocabulary's buckets, no cartesian grid (X201)") {
    for (name <- Seq("q244_ql_batch", "q245_boolean_batch")) {
      val postingScans = scans(name).filter(
        _.get("Location").exists(_.contains("postings")))
      assert(postingScans.nonEmpty, s"$name must read the persisted postings")
      assert(postingScans.forall(_("PartitionFilters").contains("tbucket")),
        s"$name postings scans must carry the bucket PartitionFilters")
      val p = staticPlan(name)
      assert(!p.contains("CartesianProduct"),
        s"the batch shape must never form |queries|x|corpus|:\n$p")
    }
    // the candidates x query-terms grid joins by equi keys; only the
    // one-row stats frame rides a broadcast nest
    val p244 = staticPlan("q244_ql_batch")
    assert(p244.contains("TakeOrderedAndProject") || p244.contains("Window"),
      s"per-query rank cut missing:\n$p244")
  }

  test("filters/date_range aggs: one conditional-count row, zero row-mass exchange (X269/X274)") {
    for (name <- Seq("q311_filters_agg", "q315_date_range")) {
      val p = staticPlan(name)
      // the only shuffle allowed is the one-row-per-task partial
      // aggregate collapsing to the global row (SinglePartition); a
      // hashpartitioning exchange would mean row mass moved
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name must not shuffle row mass:\n$p")
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
        s"$name must be a conditional-count aggregate:\n$p")
    }
  }

  test("bucket_sort: size-bounded cut plans as a TakeOrderedAndProject heap (X275)") {
    val p = staticPlan("q316_bucket_sort")
    assert(p.contains("TakeOrderedAndProject"),
      s"from/size must push into the heap, not a global sort + slice:\n$p")
  }

  test("span containment: only the involved terms' buckets are listed (X273)") {
    for (name <- Seq("q317_span_within", "q318_span_containing")) {
      val postingScans = scans(name).filter(
        _.get("Location").exists(_.contains("postings")))
      assert(postingScans.nonEmpty, s"$name must read the persisted postings")
      assert(postingScans.forall(_("PartitionFilters").contains("tbucket")),
        s"$name postings scans must prune to the terms' buckets")
      assert(!staticPlan(name).contains("CartesianProduct"),
        s"$name must band, not cross-product")
    }
  }

  test("sampler cut plans as a TakeOrderedAndProject heap, never a global sort (X284)") {
    val p = staticPlan("q327_sampler")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("diversified sampler: per-key cap pruned below the window, then the heap (X284)") {
    val p = finalPlan("q328_diversified_sampler")
    assert(p.contains("WindowGroupLimit"),
      s"the per-key cap must prune before the exchange:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the global cut must be a heap, not Sort+GlobalLimit:\n$p")
  }

  test("top_metrics: one map-side-combined aggregate, no window (X296)") {
    val p = staticPlan("q342_top_metrics")
    assert(!p.contains("Window"), s"argmax must be max_by, not a window:\n$p")
    // struct-valued max_by plans as SortAggregate; the scale property is
    // the PARTIAL side — per-task maxima before the exchange
    assert(p.contains("partial_max_by"),
      s"max_by must combine map-side:\n$p")
  }

  test("filtered PQ probe: the probe set still reaches the codes scan as partition filters (X294)") {
    val parts = df("q340_knn_filtered_pq").queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("codes")) =>
        s.metadata.getOrElse("PartitionFilters", "")
    }
    assert(parts.exists(_.contains("ivf_list")),
      s"probe must prune the codes directories: $parts")
  }

  test("string_stats: raw text never crosses an exchange — only (key, char, count) rows shuffle (X291)") {
    // exchanges only exist after preparation; the UNEXECUTED adaptive
    // plan still holds plain ShuffleExchangeExec nodes (no stage wrappers)
    val prepared = df("q337_string_stats").queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = prepared.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.nonEmpty, "the per-key/per-char aggregates shuffle their keys")
    assert(shuffles.forall(_.output.forall(a => a.name != "text")),
      s"exchanges must carry aggregate rows, not document text: " +
        shuffles.map(_.output.map(_.name).mkString("[", ",", "]")).mkString(" "))
  }

  test("normalize: serves from the pinned bucket frame — one-row stats broadcast, zero row-mass exchange (X295)") {
    // the q341 daily aggregate pins at build; the six method passes then
    // read the LogicalRDD + broadcast one-row stats frames — the only
    // remaining exchanges are SinglePartition (one-row stats collapse)
    // and the output-order range partition, never hashpartitioning
    val p = finalPlan("q341_normalize")
    assert(!p.contains("Exchange hashpartitioning"),
      s"normalize must not re-shuffle the bucket frame:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the per-method stats rows must broadcast:\n$p")
  }

  test("ip_range: one conditional-count pass, zero row-mass exchange (X298)") {
    val p = staticPlan("q343_ip_range")
    assert(!p.contains("Exchange hashpartitioning"),
      s"ip_range must not shuffle row mass:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"ip_range is a conditional-count aggregate:\n$p")
  }

  test("percentile family: every rank window is key-partitioned, never a global row-mass sort (X292/X293/X303)") {
    for (name <- Seq("q338_boxplot", "q339_mad", "q347_moving_percentiles")) {
      val plan = df(name).queryExecution.sparkPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, s"$name ranks via a window")
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$name: a window without a partition spec pulls all rows to one task")
      assert(!plan.toString.contains("CartesianProduct"),
        s"$name must not expand the pair space")
    }
  }

  test("three-leg hybrid: each leg cut is a heap, fusion never cross-products row mass (X299/q348)") {
    val p = staticPlan("q348_hybrid_maxsim")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"the bounded leg cuts plan as heaps:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only one-row stats frames may nested-loop (BNLJ BuildRight):\n$p")
  }
}
