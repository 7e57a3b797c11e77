package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.util.Sampling

/** SQL-vs-Column parity for every pipeline kernel registered in
  * [[PipelineSqlFunctions]]: the SQL surface and the Column API must
  * produce identical results row-for-row, so the two sources of truth
  * (UnresolvedFunction trees vs Column compositions) cannot drift. */
class PipelineSqlSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs: DataFrame = {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs away"),
      (2L, "le chat et le chien sont dans la maison de la ville"),
      (3L, ""),
      (4L, null),
      (5L, "Visit https://example.com/x?y=1 or mail a.b@test.org today!"),
      (6L, "internationalization supercalifragilistic antidisestablishmentarianism"),
      (7L, "tab\therevtab and\nnewline mixed   spaces"),
      (8L, "Punct!!! ??? ,,, ;;; ::: ''' \"\"\" ((( ))) [[[ ]]] {{{ }}}"),
      (9L, "the quick brown fox jumps over the lazy dog and runs away"), // dup of 1 mod case
      (10L, "der Hund und die Katze sind mit dem Ball im Garten")
    ).toDF("doc_id", "text")
    df.createOrReplaceTempView("pipe_docs")
    df
  }

  /** Collects (doc_id, value) maps from both surfaces and compares. */
  private def parity(sqlExpr: String, colExpr: org.apache.spark.sql.Column): Unit = {
    docs // force fixture view + function registration
    val viaSql = spark.sql(s"SELECT doc_id, $sqlExpr AS v FROM pipe_docs ORDER BY doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    val viaCol = docs.select(col("doc_id"), colExpr.as("v")).orderBy("doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    assert(viaSql == viaCol, s"SQL '$sqlExpr' diverged from the Column API")
  }

  test("graft_tokens == TextAnalysis.tokens") {
    parity("graft_tokens(text)", TextAnalysis.tokens(col("text")))
  }

  test("graft_script_lang_id == TextAnalysis.langIdScript") {
    parity("graft_script_lang_id(text)", TextAnalysis.langIdScript(col("text")))
    val r = spark.sql("SELECT graft_script_lang_id('機械学習は楽しい') AS l")
      .head().getString(0)
    assert(r == "ja")
  }

  test("graft_tokens mode flag + graft_segment_unicode == the unicode kernels") {
    parity("graft_tokens(text, 'ws')", TextAnalysis.tokens(col("text")))
    parity("graft_tokens(text, 'unicode')",
      TextAnalysis.tokens(col("text"), unicode = true))
    parity("graft_segment_unicode(text)",
      TextAnalysis.segmentUnicode(col("text")))
    // CJK run actually splits through the SQL surface
    val r = spark.sql(
      "SELECT graft_tokens('spark 機械学習 rocks', 'unicode') AS t")
      .head().getSeq[String](0)
    assert(r == Seq("spark", "機", "械", "学", "習", "rocks"))
    // a non-literal or unknown mode is a clean error
    val e = intercept[Exception](
      spark.sql("SELECT graft_tokens(text, 'nope') FROM pipe_docs").collect())
    assert(e.getMessage.contains("mode") || e.getMessage.contains("nope"))
    // bigram mode (X213): parity with the Column kernel + the n−1 rule
    parity("graft_tokens(text, 'bigram')",
      TextAnalysis.tokens(TextAnalysis.segmentUnicodeBigram(col("text"))))
    parity("graft_segment_bigram(text)",
      TextAnalysis.segmentUnicodeBigram(col("text")))
    val b = spark.sql(
      "SELECT graft_tokens('spark 機械学習 rocks', 'bigram') AS t")
      .head().getSeq[String](0)
    assert(b == Seq("spark", "機械", "械学", "学習", "rocks"))
  }

  test("graft_bpe_count == TextAnalysis.approxBpeCount") {
    parity("graft_bpe_count(text)", TextAnalysis.approxBpeCount(col("text")))
  }

  test("graft_lang_id == TextAnalysis.langId (en/fr/de hits + und fallback)") {
    parity("graft_lang_id(text)", TextAnalysis.langId(col("text")))
    val got = spark.sql(
      "SELECT doc_id, graft_lang_id(text) AS l FROM pipe_docs WHERE doc_id IN (1,2,10,6)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 10L -> "de", 6L -> "und"))
  }

  test("graft_quality_score == TextAnalysis.qualityScore") {
    parity("graft_quality_score(text)", TextAnalysis.qualityScore(col("text")))
  }

  test("graft_gate_reason == Curation.gopherGate reason (default thresholds)") {
    docs // force fixture view + function registration
    // the shared fixture is all-short docs; a dedicated fixture exercises
    // a keep and three distinct rejection rules
    val gateDocs = Seq(
      (100L, "the quick brown fox jumps over a lazy dog and runs to the " +
        "river bank in spring for fun on sunny days with friends"), // kept
      (101L, Seq.fill(8)("the cats with").mkString(" ")),           // repetition
      (102L, (1 to 25).map(i => s"tok$i").mkString(" ")),           // few_stopwords
      (103L, Seq.fill(25)("abcdefghijkl").mkString(" "))            // word_len_high
    ).toDF("doc_id", "text")
    gateDocs.createOrReplaceTempView("gate_docs")
    def viaSql(view: String) = spark.sql(
      s"SELECT doc_id, graft_gate_reason(text) AS v FROM $view ORDER BY doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    def viaOp(df: DataFrame) = Curation.gopherGate(df, "doc_id", col("text"))
      .select(col("doc_id"), col("reason").as("v")).orderBy("doc_id")
      .collect().map(r => r.get(0) -> r.get(1)).toSeq
    assert(viaSql("pipe_docs") == viaOp(docs),
      "SQL gate reason diverged from the DataFrame gate on the shared fixture")
    val op = viaOp(gateDocs)
    assert(viaSql("gate_docs") == op,
      "SQL gate reason diverged from the DataFrame gate on the gate fixture")
    assert(op.map(_._2).toSet ===
      Set(null, "repetition", "few_stopwords", "word_len_high"), op.toString)
  }

  test("graft_scrub == TextAnalysis.scrub (urls + emails gone)") {
    parity("graft_scrub(text)", TextAnalysis.scrub(col("text")))
    val s = spark.sql("SELECT graft_scrub(text) AS s FROM pipe_docs WHERE doc_id = 5")
      .head().getString(0)
    assert(s == "Visit or mail today!")
  }

  test("graft_fingerprint == TextAnalysis.fingerprint (case/ws-normalized)") {
    parity("graft_fingerprint(text)", TextAnalysis.fingerprint(col("text")))
    val fps = spark.sql(
      "SELECT graft_fingerprint(text) AS f FROM pipe_docs WHERE doc_id IN (1, 9)")
      .collect().map(_.getString(0)).toSet
    assert(fps.size == 1, "case-insensitive dup must share a fingerprint")
  }

  test("graft_rolling_hash == TextAnalysis.rollingHash") {
    parity("graft_rolling_hash(text)", TextAnalysis.rollingHash(col("text")))
  }

  test("graft_shingles == TextAnalysis.shingles") {
    parity("graft_shingles(text, 3)", TextAnalysis.shingles(col("text"), 3))
  }

  test("graft_simhash == Dedup.simhash64") {
    parity("graft_simhash(text)", Dedup.simhash64(col("text")))
  }

  test("graft_minhash == Dedup.minhashSignature") {
    parity("graft_minhash(text, 3, 8)", Dedup.minhashSignature(col("text"), 3, 8))
  }

  test("graft_band_keys == Dedup.lshBandKeys over the same signature") {
    parity("graft_band_keys(graft_minhash(text, 3, 8), 8, 2)",
      Dedup.lshBandKeys(Dedup.minhashSignature(col("text"), 3, 8), 8, 2))
  }

  test("graft_hash_bucket / graft_hash_split == Sampling twins") {
    parity("graft_hash_bucket(doc_id)", Sampling.hashBucket(col("doc_id")))
    parity("graft_hash_bucket(doc_id, 'epoch7')", Sampling.hashBucket(col("doc_id"), "epoch7"))
    val viaSql = spark.sql(
      "SELECT doc_id, graft_hash_split(doc_id, 0.8, 0.1) AS v FROM pipe_docs ORDER BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val viaCol = Sampling.hashSplit(docs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split")).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("graft_feature_mask / graft_lr_prob == Curation twins") {
    parity("graft_feature_mask(text, 16)", Curation.featureMask(col("text"), 16))
    val w = Seq(0.5, -0.25, 0.125, 1.0)
    parity(
      "graft_lr_prob(graft_feature_mask(text, 4), " +
        "array(0.5D, -0.25D, 0.125D, 1.0D), -0.75D)",
      Curation.lrProb(Curation.featureMask(col("text"), 4), w, -0.75))
    // decimal literals (plain SQL 0.5) fold too
    parity(
      "graft_lr_prob(graft_feature_mask(text, 2), array(0.5, 0.25), 0.0)",
      Curation.lrProb(Curation.featureMask(col("text"), 2), Seq(0.5, 0.25), 0.0))
    intercept[Exception] {
      spark.sql("SELECT graft_lr_prob(graft_feature_mask(text, 2), doc_id, 0.0)" +
        " FROM pipe_docs").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_feature_mask(text, 61) FROM pipe_docs").collect()
    }
  }

  test("static params must be literals; bad arity/fractions rejected") {
    intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, doc_id) FROM pipe_docs").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_hash_split(doc_id, 0.8, 0.4) FROM pipe_docs").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT graft_hash_bucket() FROM pipe_docs").collect()
    }
    // fixed-arity functions report the clean arity message, not an
    // IndexOutOfBounds from inside the builder
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text) FROM pipe_docs").collect()
    }
    assert(e.getMessage.contains("graft_shingles expects 2"), e.getMessage)
  }

  // ----------------------------------------------------------------
  // whole pipelines in pure SQL, checked against the DataFrame ops
  // ----------------------------------------------------------------

  test("near-dup candidate pairs in pure SQL == Dedup.minhashCandidatePairs") {
    docs // force fixture + registration
    val sql = spark.sql(
      """WITH banded AS (
           SELECT doc_id, band
           FROM pipe_docs
           LATERAL VIEW explode(graft_band_keys(graft_minhash(text, 3, 8), 8, 2)) AS band)
         SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.doc_id < b.doc_id
         ORDER BY id1, id2""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val api = Dedup.minhashCandidatePairs(docs, "doc_id", col("text"))
      .orderBy("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sql == api)
    assert(sql.contains((1L, 9L)), "case-variant dup pair must be a candidate")
  }

  test("top terms in pure SQL == TextAnalysis.topTerms") {
    docs
    val sql = spark.sql(
      """SELECT term, count(1) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
         FROM pipe_docs LATERAL VIEW explode(graft_tokens(text)) AS term
         WHERE term <> ''
         GROUP BY term ORDER BY n_occurrences DESC, term ASC LIMIT 5""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val api = TextAnalysis.topTerms(docs, "doc_id", col("text"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sql == api)
  }

  test("graft_priority: SQL top-k sampling == Curation.prioritySample") {
    docs
    val sql = spark.sql(
      """SELECT doc_id, round(graft_priority(doc_id, length(text), 'r6'), 6) AS priority
         FROM pipe_docs WHERE length(text) > 0
         ORDER BY graft_priority(doc_id, length(text), 'r6') DESC, doc_id LIMIT 3""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val api = graft.operators.Curation.prioritySample(
        docs, "doc_id", org.apache.spark.sql.functions.length(col("text")), k = 3, seed = "r6")
      .select(col("doc_id"), col("priority"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sql == api)
  }

  test("graft_cdc_cut == cdcChunks boundary rule; graft_jl_sign == Ann.jlSign matrix") {
    docs // force registration
    // independent 28-bit base, same as the operators' convention
    def base28(t: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7), 16)
    val words = (0 until 64).map(i => s"w$i")
    words.toDF("t").createOrReplaceTempView("cdc_words")
    val cuts = spark.sql("SELECT t, graft_cdc_cut(t, 16) AS c FROM cdc_words")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    words.foreach(w => assert(cuts(w) == (base28(w) % 16 == 0), s"cut mismatch for $w"))
    assert(cuts.values.exists(identity) && cuts.values.exists(!_),
      "fixture should contain both cut and non-cut tokens")
    val signs = spark.sql(
      """SELECT j, i, graft_jl_sign('jl', j, i) AS s
         FROM (SELECT explode(sequence(0, 3)) AS j), (SELECT explode(sequence(0, 7)) AS i)""")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (j <- 0 until 4; i <- 0 until 8)
      assert(signs((j, i)) == graft.operators.Ann.jlSign("jl", j, i), s"sign mismatch at ($j,$i)")
  }
}
