package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lang(text: String): String =
    Seq(text).toDF("t").select(TextAnalysis.langId($"t")).head().getString(0)

  test("langId picks the max-hits language") {
    assert(lang("the cat sat on the mat with a hat") == "en")
    assert(lang("der hund und die katze im garten") == "de")
  }

  test("langId tie-break picks the alphabetically-FIRST language (oracle CASE-chain rule)") {
    // 'la' and 'de' are stopwords in BOTH es and fr (2 hits each, en=0):
    // the tie must resolve to 'es' (es < fr), matching the ordered CASE
    // chain the DuckDB oracle uses.
    assert(lang("la de xyz") == "es")
    // 'en un' also tie es/fr -> es
    assert(lang("en un qqq") == "es")
  }

  test("langId returns 'und' when nothing matches") {
    assert(lang("zzz qqq xyzzy") == "und")
    assert(lang("") == "und")
  }

  test("langIdScript: stopword vote first, script fallback only on 'und'") {
    def lid(text: String): String =
      Seq(text).toDF("t").select(TextAnalysis.langIdScript($"t"))
        .head().getString(0)
    // wherever the stopword vote lands, identical to langId
    for (t <- Seq("the cat sat on the mat with a hat",
        "der hund und die katze im garten", "zzz qqq xyzzy", ""))
      assert(lid(t) == lang(t), s"ASCII differential broke on '$t'")
    // unsegmented runs: kana wins over han (kana unique to Japanese)
    assert(lid("機械学習は楽しい") == "ja")
    assert(lid("深度学习模型") == "zh")
    assert(lid("ภาษาไทยทดสอบ") == "th")
    // segmented Chinese still resolves via the zh stopword vote
    assert(lid("的 了 是 在 我") == "zh")
    // any stopword hit pre-empts the script fallback (mixed doc)
    assert(lid("the quick fox 機械") == "en")
  }

  test("scriptProfile: exact per-class codepoint counts") {
    val row = TextAnalysis.scriptProfile(
        Seq((1L, "ab 機械 かな ไทย!")).toDF("doc_id", "text"), col("text"))
      .head()
    def g(c: String) = row.getLong(row.fieldIndex(c))
    assert(g("n_han") == 2 && g("n_kana") == 2 && g("n_thai") == 3 &&
      g("n_latin") == 2)
    assert(g("n_chars_total") == "ab 機械 かな ไทย!".length)
  }

  test("unicode tokens mode: ASCII byte-identical, unsegmented runs split per character") {
    def toks(text: String, unicode: Boolean): Seq[String] =
      Seq(text).toDF("t").select(TextAnalysis.tokens($"t", unicode))
        .head().getSeq[String](0)
    // ASCII (and anything without the covered blocks): the pad is the
    // identity, both modes byte-identical — every existing oracle holds
    for (t <- Seq("Merge Sort beats bubble", "  a\tb ", "", "naïve café – ok"))
      assert(toks(t, unicode = true) == toks(t, unicode = false),
        s"ASCII differential broke on '$t'")
    // a CJK run becomes per-character units, neighbors untouched
    assert(toks("spark 機械学習 rocks", unicode = true) ==
      Seq("spark", "機", "械", "学", "習", "rocks"))
    // whitespace-only mode: the whole run is ONE opaque token (the
    // 100 TB failure mode the fallback exists to fix)
    assert(toks("spark 機械学習 rocks", unicode = false) ==
      Seq("spark", "機械学習", "rocks"))
    // kana + han mixed run; lowercasing still applies to the ASCII part
    assert(toks("GPUで学ぶ", unicode = true) == Seq("gpu", "で", "学", "ぶ"))
    // Thai run splits per character (combining marks become units — the
    // documented coarseness of the regex-only fallback)
    assert(toks("ไทย", unicode = true) == Seq("ไ", "ท", "ย"))
    // leading/trailing runs produce no empty edge tokens (outer trim)
    assert(toks("機械 end", unicode = true) == Seq("機", "械", "end"))
    // segmentUnicode composes with any text operator: postings over the
    // padded column carry per-character terms with correct positions
    val docs = Seq((1L, "sort 機械 merge")).toDF("doc_id", "text")
    val posts = TextAnalysis.positionalPostings(docs, "doc_id",
        TextAnalysis.segmentUnicode(col("text")))
      .orderBy(col("pos")).collect().map(r => (r.getInt(1), r.getString(2)))
    assert(posts.toSeq == Seq(0 -> "sort", 1 -> "機", 2 -> "械", 3 -> "merge"))
  }

  test("bigram segmentation: ASCII unchanged, run of n chars → n−1 overlapping bigrams") {
    def toks(text: String): Seq[String] =
      Seq(text).toDF("t")
        .select(TextAnalysis.tokens(TextAnalysis.segmentUnicodeBigram($"t")))
        .head().getSeq[String](0)
    // ASCII differential: byte-identical through both passes
    for (t <- Seq("Merge Sort beats bubble", "  a\tb ", "", "naïve café – ok"))
      assert(toks(t) ==
        Seq(t).toDF("t").select(TextAnalysis.tokens($"t")).head().getSeq[String](0),
        s"ASCII differential broke on '$t'")
    // n = 4 chars → exactly n−1 = 3 overlapping bigrams
    assert(toks("spark 機械学習 rocks") ==
      Seq("spark", "機械", "械学", "学習", "rocks"))
    // n = 2 → the one bigram; n = 1 → unigram (the CJKBigramFilter rule)
    assert(toks("a 機械 b") == Seq("a", "機械", "b"))
    assert(toks("a 機 b") == Seq("a", "機", "b"))
    // runs never pair across the original boundary (space between runs)
    assert(toks("機械 学習") == Seq("機械", "学習"))
    assert(!toks("機械 学習").contains("械学"),
      "bigrams must not cross an intervening non-class character")
    // a run embedded in an ASCII word still pads out as its own units
    assert(toks("abc機械学def") == Seq("abc", "機械", "械学", "def"))
    // Thai shares the class: น้ำ (3 codepoints) → 2 bigrams
    assert(toks("ไทย") == Seq("ไท", "ทย"))
  }

  test("fingerprint is whitespace/case-normalized") {
    val fps = Seq("Hello   World", "hello world", "HELLO\tWORLD", "other")
      .toDF("t").select(TextAnalysis.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(3) != fps(0))
    assert(fps(0).length == 16)
  }

  test("shingles: n consecutive tokens; fewer than n tokens -> empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles($"t", 2)).head().getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles($"t", 3)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("token counts: whitespace tokens + ceil(len/4) BPE-ish units") {
    val r = Seq("hello a magnificent").toDF("t").select(
      size(TextAnalysis.tokens($"t")).as("n"),
      TextAnalysis.approxBpeCount($"t").as("bpe")).head()
    assert(r.getInt(0) == 3)
    // ceil(5/4)=2, ceil(1/4)->1 (floor 1), ceil(11/4)=3 -> 6
    assert(r.getLong(1) == 6L)
  }

  test("scrub removes URLs and e-mails and collapses whitespace") {
    def scrubOf(s: String) =
      Seq(s).toDF("t").select(TextAnalysis.scrub($"t")).head().getString(0)
    assert(scrubOf("see https://example.com/a?b=c for details") == "see for details")
    assert(scrubOf("mail bob@example.com  or  http://x.io now") == "mail or now")
    assert(scrubOf("clean   text stays") == "clean text stays")
    assert(scrubOf("http://only.example.org") == "")
  }

  test("chunksFromTokens: overlapping windows, short tail, never zero chunks") {
    def chunksOf(text: String, size: Int, overlap: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(TextAnalysis.chunksFromTokens(TextAnalysis.tokens($"t"), size, overlap))
        .head().getSeq[String](0)

    val toks = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4, overlap 2 -> starts 0,2,4,6,8: windows of 4 (last short)
    val c = chunksOf(toks, 4, 2)
    assert(c == Seq("w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(chunksOf("a b", 4, 2) == Seq("a b"), "short doc -> one chunk")
    assert(chunksOf("a b c d e", 4, 2) == Seq("a b c d", "c d e"), "short tail kept")
    // consecutive chunks share exactly `overlap` tokens
    val shared = c.sliding(2).map { case Seq(x, y) =>
      x.split(" ").toSet.intersect(y.split(" ").toSet).size }.toSeq
    assert(shared.forall(_ == 2))
    intercept[IllegalArgumentException](chunksOf("a", 4, 4))
  }

  test("rollingHash is deterministic and whitespace-normalized") {
    val hs = Seq("a  b", "a b", "a c").toDF("t")
      .select(TextAnalysis.rollingHash($"t")).collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("rollingHash survives long documents under ANSI (no Long overflow)") {
    // the 2^61-1 modulus overflowed acc*31 on any text past ~13 chars;
    // the < 2^57 modulus keeps acc*31+255 under 2^63 at every step
    val long1 = ("the quick brown fox jumps over the lazy dog " * 200)
    val hs = Seq(long1, long1 + "!").toDF("t")
      .select(TextAnalysis.rollingHash($"t")).collect().map(_.getLong(0))
    assert(hs(0) != hs(1))
    hs.foreach(h => assert(h >= 0 && h < 144115188075855859L))
  }

  test("qualityScore is within [-0.25, 1] and favors clean prose over noise") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and runs on with a steady pace for a while",
      "!!! ??? ((()))) ,,,, ....")
      .toDF("t").select(TextAnalysis.qualityScore($"t")).collect().map(_.getDouble(0))
    assert(scores(0) > scores(1))
    scores.foreach(s => assert(s >= -0.25 && s <= 1.0))
  }

  test("tfidfTopTerms: corpus-wide terms score low, distinctive terms rank first") {
    val docs = Seq(
      (1L, "shared shared unique1"),
      (2L, "shared shared unique2 unique2"),
      (3L, "shared other")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", $"text", topN = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("rank"))) -> r.getString(1)).toMap
    // 'shared' appears in all 3 docs -> idf = ln(1) = 0, so it can never
    // outrank a distinctive term despite tf=2
    assert(top((1L, 1)) == "unique1")
    assert(top((2L, 1)) == "unique2")
    assert(top((3L, 1)) == "other")
    // tf*idf for 'shared' is exactly 0 -> still present as a trailing rank
    assert(top((1L, 2)) == "shared")
  }

  test("repetitionSignals: degenerate repetition scores high, varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),             // one token repeated
      (2L, "the quick brown fox jumps over lazy dogs"),  // all distinct
      (3L, "ab")                                         // shorter than n -> 0 ngrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "doc_id", $"text", n = 3)
      .select("doc_id", "dup_ngram_frac", "top_token_frac").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 0.75, "4 identical 3-grams -> 3 of 4 are dups")
    assert(got(1L)._2 == 1.0, "single repeated token owns all mass")
    assert(got(2L)._1 == 0.0 && got(2L)._2 == 0.125)
    assert(got(3L)._1 == 0.0, "no 3-grams -> defined as 0, not NaN")
  }

  test("piiCounts counts urls and emails; scrubbing them zeroes the counts") {
    val docs = Seq(
      (1L, "see https://a.example/x and http://b.example plus mail me@host.com"),
      (2L, "clean prose with no links at all")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiCounts(docs, $"text")
      .select($"doc_id", $"n_urls", $"n_emails", $"has_pii")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((2, 1, true)))
    assert(got(2L) === ((0, 0, false)))
    // measurement and rewrite agree: after scrub, nothing is left to count
    val scrubbed = TextAnalysis.piiCounts(
      docs.withColumn("text", TextAnalysis.scrub($"text")), $"text")
      .select($"has_pii").as[Boolean].collect()
    assert(scrubbed.forall(_ == false))
  }

  test("bigramTable: counts, tie-break by continuation, no cross-document bigrams") {
    val docs = Seq(
      (1L, "a b a b c"),  // (a,b) x2, (b,a), (b,c)
      (2L, "c d"),        // (c,d) — and NO (c,c) bridging docs 1 and 2
      (3L, "solo")        // single token: contributes nothing
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramTable(docs, "doc_id", col("text"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 1),
      ("b", "a", 1L, 1), ("b", "c", 1L, 2), // tie on n=1 -> w2 asc
      ("c", "d", 1L, 1)))
  }

  test("phraseMatch: counts occurrences, respects order, 3-term phrases, slot adjacency") {
    val docs = Seq(
      (1L, "a b c a b"),      // "a b" twice; "a b c" once; no "b a"
      (2L, "b a"),            // reversed -> no "a b"
      (3L, "a  b"),           // double space: split yields no empty slot -> match
      (4L, "a\nb")            // newline is whitespace too -> adjacent -> match
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    def m(p: String*) = TextAnalysis.phraseMatch(idx, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m("a", "b") === Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
    assert(m("b", "a") === Map(2L -> 1L))
    assert(m("a", "b", "c") === Map(1L -> 1L))
    assert(m("a", "c").isEmpty)
  }

  test("collocations: PMI from one bigram table, minCount floor, deterministic order") {
    val docs = Seq((1L, "a b a b c d"), (2L, "c d e")).toDF("doc_id", "text")
    // bigrams: (a,b)x2 (b,a) (b,c) (c,d)x2 (d,e); T=7
    val out = TextAnalysis.collocations(docs, "doc_id", col("text"), minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    def pmi(n12: Long, n1: Long, n2: Long) =
      BigDecimal.valueOf(math.log(n12.toDouble * 7.0 / (n1.toDouble * n2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // heads: a=2 b=2 c=2 d=1; tails: b=2 a=1 c=1 d=2 e=1
    assert(out.toSet === Set(
      ("a", "b", 2L, 2L, 2L, pmi(2, 2, 2)),
      ("c", "d", 2L, 2L, 2L, pmi(2, 2, 2))))
    // tie on pmi -> (w1, w2) lexicographic
    assert(out.map(t => (t._1, t._2)).toSeq === Seq(("a", "b"), ("c", "d")))
  }

  test("proximityMatch: NEAR/k both orders, band boundaries, no double-count") {
    val docs = Seq(
      (1L, "a x x b"),         // dist 3 <= 3 -> pair; bands straddle for d=3
      (2L, "b x x x a"),       // dist 4 > 3 -> no pair (reverse order)
      (3L, "b a"),             // dist 1, b before a
      (4L, "a x b x a"),       // pairs: (0,2) and (4,2) -> 2 pairs, min 2
      (5L, "a a a")            // no b -> absent
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val out = TextAnalysis.proximityMatch(idx, "a", "b", maxDist = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out === Map(1L -> ((1L, 3)), 3L -> ((1L, 1)), 4L -> ((2L, 2))))
    // ordered span-near (X233): only a-BEFORE-b pairs count — doc 3
    // (b before a) and doc 4's (4,2) reverse pair drop out
    val ord = TextAnalysis.spanNearOrdered(idx, "a", "b", maxDist = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(ord === Map(1L -> ((1L, 3)), 4L -> ((1L, 2))))
    // same-term ordered pairs keep one orientation, gap-band boundary
    val same = TextAnalysis.spanNearOrdered(idx, "a", "a", maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // doc 4: a at 0 and 4 -> gap 4 > 2, no pair; doc 5: (0,1),(1,2),(0,2)
    assert(same === Map(5L -> ((3L, 1))))
    intercept[IllegalArgumentException](
      TextAnalysis.spanNearOrdered(idx, "a", "b", 0))
    intercept[IllegalArgumentException](
      TextAnalysis.spanNearOrdered(idx, "", "b", 2))
  }

  test("spanNot: include spans survive unless an exclude sits in [pos-pre, pos+post] (X263)") {
    val docs = Seq(
      (1L, "a x x b"),   // a@0, b@3: outside pre=2/post=2 -> a survives
      (2L, "a x b"),     // b@2 within post 2 of a@0 -> a excluded
      (3L, "b x x a"),   // b@0 within pre 2? a@3, window [1,5] -> b@0 outside -> survives
      (4L, "a b x a"),   // a@0 excluded (b@1), a@3 survives (b@1 < 3-2=1? 1 >= 1 -> excluded!)
      (5L, "a a")        // no b -> both survive
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val out = TextAnalysis.spanNot(idx, "a", "b", pre = 2, post = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 4: a@3 has b@1 in [1, 5] -> excluded too; the doc drops out
    assert(out === Map(1L -> 1L, 3L -> 1L, 5L -> 2L))
    // asymmetric window: pre=0 keeps b-before-a spans
    val asym = TextAnalysis.spanNot(idx, "a", "b", pre = 0, post = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 3: b@0 before a@3 -> survives; doc 4: a@0 excluded (b@1 within
    // post 2), a@3 survives (b@1 not in [3, 5])
    assert(asym === Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    intercept[IllegalArgumentException](TextAnalysis.spanNot(idx, "a", "a", 1, 1))
    intercept[IllegalArgumentException](TextAnalysis.spanNot(idx, "", "b", 1, 1))
    intercept[IllegalArgumentException](TextAnalysis.spanNot(idx, "a", "b", -1, 1))
  }

  test("spanWithin/spanContaining: containment at span grain, distinct counting (X273)") {
    val docs = Seq(
      (1L, "sort merge spark x merge"), // span@0 len 3; merge@1 inside, merge@4 outside
      (2L, "merge sort merge spark"),   // span@1; merge@2 inside, merge@0 outside
      (3L, "sort merge spark sort merge spark"), // spans@0,@3; merges@1,@4 each inside
      (4L, "merge x sort spark"),       // no full span -> nothing
      (5L, "sort merge spark")          // span@0; merge@1 inside
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val big = Seq("sort", "merge", "spark")
    val within = TextAnalysis.spanWithin(idx, "merge", big)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(within === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 1L))
    val containing = TextAnalysis.spanContaining(idx, "merge", big)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(containing === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 5L -> 1L))
    // a little term absent from every span: within empty, containing empty
    assert(TextAnalysis.spanWithin(idx, "x", big).isEmpty)
    assert(TextAnalysis.spanContaining(idx, "x", big).isEmpty)
    // overlapping spans covering one little occurrence count it once on
    // the within side and each span once on the containing side
    val dup = Seq((9L, "sort sort sort")).toDF("doc_id", "text")
    val dupIdx = TextAnalysis.positionalPostings(dup, "doc_id", col("text"))
    val w2 = TextAnalysis.spanWithin(dupIdx, "sort", Seq("sort", "sort"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w2 === Map(9L -> 3L), "each sort occurrence sits in >= 1 span, counted once")
    val c2 = TextAnalysis.spanContaining(dupIdx, "sort", Seq("sort", "sort"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2 === Map(9L -> 2L), "spans @0 and @1 each contain a sort")
    intercept[IllegalArgumentException](
      TextAnalysis.spanWithin(idx, "merge", Seq("sort")))
    intercept[IllegalArgumentException](
      TextAnalysis.spanWithin(idx, "", big))
  }

  test("bm25: hand-computed scores, rarity beats frequency, zero-score docs absent") {
    val docs = Seq(
      (1L, "x y x z"),   // tf(x)=2, dl=4
      (2L, "x q q q"),   // tf(x)=1, dl=4
      (3L, "q q")        // no query terms -> filtered out
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", col("text"), Seq("x", "y"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet === Set(1L, 2L))
    // replicate the formula: N=3, avgdl=10/3; term x: df=2, term y: df=1
    def part(tf: Double, df: Double, dl: Double): BigDecimal = {
      val n = 3.0; val avgdl = 10.0 / 3.0
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      BigDecimal.valueOf(idf * tf * 2.2 / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def score(ps: Seq[BigDecimal]) =
      BigDecimal.valueOf(ps.map(_.toDouble).reduce(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = score(Seq(part(2, 2, 4), part(1, 1, 4)))
    val d2 = score(Seq(part(1, 2, 4)))
    val byId = out.map(t => t._1 -> t._3).toMap
    assert(byId(1L) == d1 && byId(2L) == d2)
    assert(d1 > d2, "doc with both terms (one rare) must outrank")
  }

  test("langProfile: majority language per line, ties lexicographic, blank lines dropped") {
    val docs = Seq(
      // 2 en lines + 1 de line + blank line -> majority en 2/3, 2 langs
      (1L, "the cat sat on the mat\n\nder hund und die katze\nwith a hat on the cat"),
      // no stopword hits on either line -> both 'und'; majority 'und', 0 langs
      (2L, "zzz qqq\nxyzzy plugh"),
      // empty doc -> no non-blank lines -> omitted
      (3L, "\n\n")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langProfile(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((3L, "en", 0.666667, 2L)))
    assert(out(2L) === ((2L, "und", 1.0, 0L)))
  }

  test("lmScore: smoothed bigram cross-entropy, short docs omitted") {
    // ref model: bigrams (a,b)x2 (b,a) (b,c) (c,d); heads a:2 b:2 c:1; V=4
    val ref = Seq((1L, "a b a b c"), (2L, "c d"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(ref, ref, "doc_id", col("text"), alpha = 0.5)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L)) // doc 3 has no bigrams
    // mirror the operator's rounding discipline exactly: per-bigram -ln P
    // rounded half-up at 6, exact decimal sum, one double division, round
    def lp(p: Double) = BigDecimal.valueOf(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def mean(ps: Seq[Double]) = BigDecimal.valueOf(ps.map(lp).sum.toDouble / ps.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = 2.5 / 4.0; val pBA = 1.5 / 4.0; val pBC = 1.5 / 4.0; val pCD = 1.5 / 3.0
    val x1 = mean(Seq(pAB, pBA, pAB, pBC))
    assert(out(1L)._1 == 4L && out(1L)._2 == x1)
    assert(out(1L)._3 == BigDecimal.valueOf(math.exp(x1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._1 == 1L && out(2L)._2 == mean(Seq(pCD)))
  }

  test("lmScore: unseen head scores exactly 1/V") {
    val ref = Seq((1L, "a b a b c"), (2L, "c d")).toDF("doc_id", "text")
    val probe = Seq((9L, "z z")).toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(probe, ref, "doc_id", col("text")).head()
    // P = 0.5 / (0 + 0.5*4) = 1/4
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == BigDecimal.valueOf(-math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- stupidBackoff (X154) ----------------------------------------------

  test("stupidBackoff: each backoff branch hand-checked; short docs omitted") {
    // ref "a b c a b d": tri (a,b,c)(b,c,a)(c,a,b)(a,b,d) x1 each;
    // bi (a,b):2 (b,c):1 (c,a):1 (b,d):1; uni a:2 b:2 c:1 d:1 -> N=6 V=4
    val ref = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "a b c"), // seen trigram:        S = c3/c2(a,b) = 1/2
      (2L, "x a b"), // backoff bigram:      S = 0.4 * c2(a,b)/c1(a) = 0.4
      (3L, "q q z"), // full OOV floor:      S = 0.16 * (0+1)/(6+4)
      (4L, "a b")    // < 3 tokens: omitted
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stupidBackoff(probe, ref, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expect(s: Double) = {
      val x = r6(-math.log(s)); (1L, x, r6(math.exp(x)))
    }
    assert(out(1L) === expect(1.0 / 2.0))
    assert(out(2L) === expect(0.4 * (2.0 / 2.0)))
    assert(out(3L) === expect((0.4 * 0.4) * (1.0 / 10.0)))
  }

  test("stupidBackoff: multi-trigram mean, repeats scored every occurrence") {
    val ref = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
    // "a b c a b c": trigrams (a,b,c) (b,c,a) (c,a,b) (a,b,c) — all seen
    val probe = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.stupidBackoff(probe, ref, "doc_id", col("text")).head()
    def lp(s: Double) =
      BigDecimal.valueOf(-math.log(s)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // S(abc)=1/2, S(bca)=1/1, S(cab)=1/1, S(abc)=1/2
    val want = BigDecimal.valueOf(
      Seq(0.5, 1.0, 1.0, 0.5).map(lp).sum.toDouble / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(1) === 4L && r.getDouble(2) === want)
    intercept[IllegalArgumentException](
      TextAnalysis.stupidBackoff(probe, ref, "doc_id", col("text"), lambda = 0.0))
    intercept[IllegalArgumentException](
      TextAnalysis.stupidBackoff(probe, ref, "doc_id", col("text"), lambda = 1.0))
  }

  // ---- bpePairStats (X90) ------------------------------------------------

  test("bpePairStats: census-weighted char pairs, deterministic order, single chars dropped") {
    val docs = Seq(
      (1L, "aa ab aa"),      // census: aa x2 (via census, not explode), ab x1
      (2L, "aa x")           // aa x1 more; 'x' has no pair
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, $"text", k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "a", 3L), ("a", "b", 1L)), s"got ${got.toSeq}")
  }

  // ---- cdcChunks (X87) ---------------------------------------------------

  // the operator's 28-bit md5 base, replicated independently
  private def base28(t: String): Long = java.lang.Long.parseLong(
    java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7), 16)

  test("cdcChunks: boundaries at hash-cut tokens; chunks partition the stream") {
    val words = (0 until 400).map(i => s"w$i")
    val cuts = words.filter(base28(_) % 16 == 0)
    val plain = words.filterNot(base28(_) % 16 == 0)
    assert(cuts.size >= 2 && plain.size >= 6, "fixture word pool too small")
    // doc: 3 plain, CUT, 2 plain, CUT, 1 plain -> chunks of 4, 3, 1 tokens
    val toks = Seq(plain(0), plain(1), plain(2), cuts(0), plain(3), plain(4),
      cuts(1), plain(5))
    val rows = TextAnalysis.cdcChunks(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), "doc_id", $"text")
      .orderBy("chunk_no").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 0, 4L), (1L, 4, 3L), (2L, 7, 1L)),
      s"got ${rows.toSeq}")
  }

  test("cdcChunks: identical content gets identical fingerprints at different offsets") {
    val words = (0 until 400).map(i => s"w$i")
    val cuts = words.filter(base28(_) % 16 == 0)
    val plain = words.filterNot(base28(_) % 16 == 0)
    val body = Seq(plain(0), plain(1), cuts(0), plain(2), plain(3))
    // doc 2 prepends a CUT token: chunk 0 is just the prefix, and the body
    // chunks re-align at rank 1 -> same fingerprints as doc 1's chunks
    val docs = Seq(
      (1L, body.mkString(" ")),
      (2L, (cuts(1) +: body).mkString(" "))).toDF("doc_id", "text")
    val fps = TextAnalysis.cdcChunks(docs, "doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // doc1: [plain0 plain1 cuts0][plain2 plain3]; doc2: [cuts1][same][same]
    assert(fps((1L, 0L)) == fps((2L, 1L)), "first body chunk fp must survive the shift")
    assert(fps((1L, 1L)) == fps((2L, 2L)), "second body chunk fp must survive the shift")
    assert(fps((2L, 0L)) != fps((2L, 1L)), "prefix chunk is its own content")
  }

  test("cdcChunks equals an independent Scala model on seeded random docs") {
    val rnd = new scala.util.Random(1234)
    val vocab = (0 until 200).map(i => s"w$i")
    val docs = (1L to 8L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // independent model: positions over non-empty tokens, cut when
    // base28 % 16 == 0 (token CLOSES its chunk), rank-weighted decimal fp
    def model(text: String): Seq[(Long, Int, Long, BigInt)] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq.zipWithIndex
        .filter(_._1.nonEmpty)
      var chunk = 0L
      val out = scala.collection.mutable.Map.empty[Long, (Int, Long, BigInt)]
      var rank = 0L
      toks.foreach { case (t, pos) =>
        val h = base28(t)
        val (sp, n, fp) = out.getOrElse(chunk, (pos, 0L, BigInt(0)))
        rank = n + 1
        out(chunk) = (sp, n + 1, fp + BigInt(rank) * BigInt(h))
        if (h % 16 == 0) { chunk += 1 }
      }
      out.toSeq.sortBy(_._1).map { case (c, (sp, n, fp)) => (c, sp, n, fp) }
    }
    val got = TextAnalysis.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", $"text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3),
        BigInt(r.getLong(4)))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.foreach { case (id, text) =>
      val want = model(text).map { case (c, sp, n, fp) => (c, sp, n, fp) }
      assert(got(id) == want, s"doc $id: ${got(id)} vs $want")
    }
  }

  test("cdcChunks: runs of whitespace collapse to single slots; cut-free doc is one chunk") {
    val words = (0 until 50).map(i => s"w$i").filterNot(base28(_) % 16 == 0)
    val rows = TextAnalysis.cdcChunks(
        Seq((1L, s"${words(0)}  ${words(1)}")).toDF("doc_id", "text"), "doc_id", $"text")
      .collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 2L,
      "two tokens, no cut token -> exactly one chunk of 2")
  }

  test("spanCorrupt: rate 0 passes text through, rate 1 is one full span") {
    val docs = Seq((1L, "Alpha beta GAMMA"), (2L, "x")).toDF("doc_id", "text")
    val none = TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), 0.0, "s")
      .orderBy("doc_id").collect()
    assert(none.map(_.getString(4)).toSeq == Seq("alpha beta gamma", "x"),
      "rate 0: corrupted_text is the normalized text")
    assert(none.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L
      && r.getString(5) == ""), "rate 0: nothing masked, empty targets")
    val all = TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), 1.0, "s")
      .orderBy("doc_id").collect()
    assert(all.map(_.getString(4)).toSeq == Seq("<X0>", "<X0>"),
      "rate 1: whole doc collapses to one sentinel")
    assert(all.map(_.getString(5)).toSeq == Seq("<X0> alpha beta gamma", "<X0> x"),
      "rate 1: targets carry the whole doc after the sentinel")
    assert(all.forall(r => r.getLong(3) == 1L), "rate 1: exactly one span")
  }

  test("spanCorrupt: token accounting, sentinel order, determinism at 0.5") {
    val docs = (1L to 40L).map(i =>
      (i, (0 until 30).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    def run() = TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), 0.5, "sd")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    val a = run()
    assert(a == run(), "same seed must corrupt identically")
    val sent = "<X\\d+>".r
    a.foreach { case (id, n, nMasked, nSpans, corr, tgt) =>
      assert(nSpans <= nMasked && nMasked <= n, s"doc $id: span/mask counts")
      val corrToks = if (corr.isEmpty) Array.empty[String] else corr.split(" ")
      val tgtToks = if (tgt.isEmpty) Array.empty[String] else tgt.split(" ")
      assert(corrToks.length == n - nMasked + nSpans,
        s"doc $id: corrupted keeps unmasked + one sentinel per span")
      assert(tgtToks.length == nMasked + nSpans,
        s"doc $id: targets carry masked + one sentinel per span")
      assert(sent.findAllIn(corr).toSeq == (0L until nSpans).map(k => s"<X$k>"),
        s"doc $id: sentinels in corrupted_text must be <X0>..<X${nSpans - 1}> in order")
      assert(sent.findAllIn(tgt).toSeq == (0L until nSpans).map(k => s"<X$k>"),
        s"doc $id: targets must visit the same sentinels in order")
      // splicing each target span back over its sentinel restores the doc
      val spans = tgt.split("<X\\d+> ").drop(1).map(_.stripSuffix(" "))
      val restored = spans.zipWithIndex.foldLeft(corr) { case (t, (sp, k)) =>
        t.replace(s"<X$k>", sp) }
      assert(restored.split(" ").count(_.nonEmpty) == n,
        s"doc $id: splice-back must restore all $n tokens")
    }
    val masked = a.map(_._3).sum.toDouble / a.map(_._2).sum
    assert(masked > 0.3 && masked < 0.7, s"mask rate $masked far from 0.5")
    val b = TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), 0.5, "other")
      .orderBy("doc_id").collect().map(_.getString(4)).toSeq
    assert(b != a.map(_._5), "seed must perturb the corruption")
  }

  test("spanCorrupt: zero-token docs drop; bad rate rejected") {
    val docs = Seq((1L, "one token stream"), (2L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), 0.3, "s")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(1L),
      "whitespace-only doc has no tokens to corrupt and is dropped")
    intercept[IllegalArgumentException](
      TextAnalysis.spanCorrupt(docs, "doc_id", col("text"), -0.1, "s"))
  }

  test("bpeMerges: the Sennrich corpus learns the classic trace; segment round-trips") {
    // word frequencies low:5 lower:2 newest:6 widest:3 (Sennrich §3.2's
    // worked example, expressed as a document corpus)
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "doc_id", col("text"), 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // freq 9: (e,s) from newest+widest; then (es,t) 9; then (est,</w>) 9;
    // then (l,o) 7 from low+lower
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)), s"got $merges")
    // inference: the learned merges segment an unseen word
    val seg = Seq(Tuple1("lowest")).toDF("w")
      .select(TextAnalysis.bpeSegment(col("w"),
        merges.map(m => (m._2, m._3))).as("s"))
      .head().getSeq[String](0)
    assert(seg == Seq("lo", "w", "est</w>"), s"got $seg")
    // greedy leftmost non-overlap: 'aaaa' under merge (a,a) -> aa aa
    val aa = Seq(Tuple1("aaaa")).toDF("w")
      .select(TextAnalysis.bpeSegment(col("w"), Seq(("a", "a"))).as("s"))
      .head().getSeq[String](0)
    assert(aa == Seq("aa", "aa", "</w>"), s"got $aa")
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMerges(docs, "doc_id", col("text"), 0))
  }

  test("bpeMerges: a word that fully merges to one symbol does not kill later steps") {
    // 'lo' collapses to a single symbol after (l,o) then (lo,</w>); the
    // pair census must skip such rows instead of exploding a DESCENDING
    // sequence(1,0) (element_at(syms, 0) throws INVALID_ARRAY_INDEX)
    val docs = Seq(
      (1L, Seq.fill(9)("lo").mkString(" ")),
      (2L, Seq.fill(2)("we").mkString(" "))).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "doc_id", col("text"), 6)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges.take(2) == Seq((1, "l", "o", 9L), (2, "lo", "</w>", 9L)),
      s"got $merges")
    // after 'lo' is a single symbol, learning continues on 'we' (tie at
    // freq 2 breaks lexically on (lhs, rhs): 'e' < 'w')
    assert(merges.drop(2).take(2) == Seq((3, "e", "</w>", 2L), (4, "w", "e</w>", 2L)),
      s"got $merges")
    // every pair exhausted: the trace stops early instead of erroring
    assert(merges.size == 4, s"got $merges")
  }

  test("bpeMergesBatched: batch=1 is bit-identical to the sequential path") {
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val seq1 = TextAnalysis.bpeMerges(docs, "doc_id", col("text"), 8)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat1 = TextAnalysis.bpeMergesBatched(docs, "doc_id", col("text"), 8, batch = 1)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(bat1 == seq1, s"batch=1 diverged:\n$bat1\nvs\n$seq1")
  }

  test("bpeMergesBatched: batched merges are non-interacting and individually faithful") {
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergesBatched(docs, "doc_id", col("text"), 4, batch = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // first census top pairs: (e,s) 9 taken; (es,t)/(s,t)-family blocked by
    // shared symbols; the best non-interacting follow-ups are (t,</w>) 9
    // and (l,o) 7 — (es,t) must WAIT for the next census (it cannot be
    // counted before 'es' exists)
    assert(got.head == ((1, "e", "s", 9L)), s"got $got")
    assert(got.map(m => (m._2, m._3)).contains(("t", "</w>")), s"got $got")
    assert(got.map(m => (m._2, m._3)).contains(("l", "o")), s"got $got")
    assert(!got.map(m => (m._2, m._3)).contains(("es", "t")),
      s"(es,t) cannot be counted in the census that creates 'es': $got")
    // each batch's pairs are pairwise non-interacting
    got.grouped(4).foreach { b =>
      val syms = b.flatMap(m => Seq(m._2, m._3))
      assert(syms.distinct.size == syms.size, s"shared symbol in batch $b")
      val concats = b.map(m => m._2 + m._3)
      assert(concats.intersect(syms).isEmpty, s"concat aliases a symbol in $b")
    }
    // a large budget on a tiny corpus exhausts cleanly instead of erroring
    val all = TextAnalysis.bpeMergesBatched(docs, "doc_id", col("text"),
      2000, batch = 64)
    assert(all.count() < 2000)
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMergesBatched(docs, "doc_id", col("text"), 5, 0))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeMergesBatched(docs, "doc_id", col("text"), 0, 4))
  }

  test("normalizedFingerprint: punctuation and number noise collide, real edits do not") {
    val rows = Seq(
      (1L, "the cache holds 1024 rows"),
      (2L, "The cache, holds 2048 rows!"),  // case/punct/number noise only
      (3L, "the cache drops 1024 rows"),    // a real word change
      (4L, "the cache holds 1024 rows")     // exact clone
    ).toDF("doc_id", "text")
    val fp = rows.select($"doc_id",
      TextAnalysis.fingerprint($"text").as("raw"),
      TextAnalysis.normalizedFingerprint($"text").as("norm"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(fp(1)._2 == fp(2)._2, "noise-only variants must collide normalized")
    assert(fp(1)._1 != fp(2)._1, "raw fingerprints must still tell them apart")
    assert(fp(1)._2 != fp(3)._2, "a genuine edit must NOT collide")
    assert(fp(1) == fp(4), "exact clones collide under both keys")
  }

  test("urlProfile: hand-checked normalization, registrable domains, malformed passthrough") {
    val urls = Seq(
      (1L, "HTTP://WWW.Blog.Example.COM:8080/Posts/1/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://news.bbc.co.uk/politics"),
      (3L, "https://alice.github.io/"),
      (4L, "example.com/plain?gclid=z"),
      (5L, "/relative/only"),
      (6L, "https://localhost/x")).toDF("doc_id", "url")
    val out = TextAnalysis.urlProfile(urls, "doc_id", col("url"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getString(4)))
    // scheme+host case-folded, www/port stripped, tracking dropped,
    // survivors sorted, trailing slash + fragment gone
    assert(out(0) == ((1L, "blog.example.com", "example.com",
      "https://blog.example.com/Posts/1?a=1&b=2")), s"${out(0)}")
    // multi-label public suffix: registrable domain keeps three labels
    assert(out(1) == ((2L, "news.bbc.co.uk", "bbc.co.uk",
      "https://news.bbc.co.uk/politics")), s"${out(1)}")
    assert(out(2) == ((3L, "alice.github.io", "alice.github.io",
      "https://alice.github.io/")), s"${out(2)}")
    // scheme-less input still parses; lone tracking param leaves no query
    assert(out(3) == ((4L, "example.com", "example.com",
      "https://example.com/plain")), s"${out(3)}")
    // no host: null host/domain, input passes through unchanged
    assert(out(4) == ((5L, null, null, "/relative/only")), s"${out(4)}")
    // single-label host: no registrable domain to cut
    assert(out(5) == ((6L, "localhost", null, "https://localhost/x")), s"${out(5)}")
  }

  test("urlProfile: tracking-param keys match case-insensitively, values keep case") {
    val urls = Seq(
      (1L, "https://example.com/a?UTM_SOURCE=Feed&b=2"),
      (2L, "https://example.com/a?FbClId=Y"),
      (3L, "https://example.com/a?b=MiXeD")).toDF("doc_id", "url")
    val out = TextAnalysis.urlProfile(urls, "doc_id", col("url"))
      .orderBy("doc_id").collect().map(_.getString(4))
    assert(out(0) == "https://example.com/a?b=2", s"got ${out(0)}")
    assert(out(1) == "https://example.com/a", s"got ${out(1)}")
    assert(out(2) == "https://example.com/a?b=MiXeD", s"got ${out(2)}")
  }

  test("urlProfile: extraSuffixes extends the public-suffix cut") {
    val urls = Seq((1L, "https://shop.example.xyz/a")).toDF("doc_id", "url")
    val base = TextAnalysis.urlProfile(urls, "doc_id", col("url"))
      .head().getString(3)
    assert(base == "example.xyz", "unknown suffix cuts to two labels")
    val extended = TextAnalysis.urlProfile(urls, "doc_id", col("url"),
      extraSuffixes = Seq("example.xyz")).head().getString(3)
    assert(extended == "shop.example.xyz", "extra suffix keeps three labels")
  }

  test("tagDictionary: token-boundary n-gram matches, overlaps each count") {
    val docs = Seq(
      (1L, "a b a b c"),    // "a b" at 0 and 2; "b c" at 3; "a b c" at 2
      (2L, "ab c d"),       // "ab" is ONE token: no "a b" substring hit
      (3L, "d d")           // no dictionary phrase at all
    ).toDF("doc_id", "text")
    val dict = Seq(("x", "a b"), ("y", "b c"), ("z", "a b c"), ("w", "d"))
    val out = TextAnalysis.tagDictionary(docs, "doc_id", col("text"), dict)
      .orderBy("doc_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "x", 2L), (1L, "y", 1L), (1L, "z", 1L),
      (2L, "w", 1L), (3L, "w", 2L)),
      s"got $out")
  }

  test("tagDictionary: phrase normalization, multi-phrase tags sum, bad dicts rejected") {
    val docs = Seq((1L, "Hash JOIN  beats sort merge")).toDF("doc_id", "text")
    // phrase case/extra-whitespace folds through the same tokenizer as text
    val out = TextAnalysis.tagDictionary(docs, "doc_id", col("text"),
      Seq(("join", "HASH   Join"), ("join", "sort merge"), ("agg", "group by")))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("join", 2L)), s"two phrases of one tag sum: $out")
    intercept[IllegalArgumentException](
      TextAnalysis.tagDictionary(docs, "doc_id", col("text"), Nil))
    intercept[IllegalArgumentException](
      TextAnalysis.tagDictionary(docs, "doc_id", col("text"), Seq(("t", "  "))))
    intercept[IllegalArgumentException](
      TextAnalysis.tagDictionary(docs, "doc_id", col("text"),
        Seq(("t", "a b"), ("t", "A  B"))))  // same normalized row twice
  }

  test("bpeFertility: k=0 char baseline, fertility falls as merges apply, bad grids rejected") {
    // 'low' repeated: merges learned on it collapse it fast
    val docs = Seq((1L, "low low low lower"), (2L, "low slow")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "doc_id", col("text"), 4)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeFertility(docs, "doc_id", col("text"), merges, Seq(0, 2, 4))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(0, 2, 4))
    // k = 0: every word char-segmented — fertility = weighted mean word
    // length, compression exactly 1.0
    val words = Seq("low", "low", "low", "lower", "low", "slow")
    val meanLen = words.map(_.length).sum.toDouble / words.size
    assert(out(0)._2 == words.map(_.length).sum.toLong)
    assert(math.abs(out(0)._3 - meanLen) < 1e-6 && out(0)._4 == 1.0)
    // more merges never increase token counts; compression is the inverse
    assert(out(1)._2 <= out(0)._2 && out(2)._2 <= out(1)._2)
    assert(out(2)._3 < out(0)._3, "4 merges on this corpus must cut fertility")
    for (i <- out.indices)
      assert(math.abs(out(i)._4 * out(i)._2 - out(0)._2) < 1e-3 * out(0)._2,
        "chars/token * tokens ~ total chars")
    intercept[IllegalArgumentException](
      TextAnalysis.bpeFertility(docs, "doc_id", col("text"), merges, Seq(0, 9)))
    intercept[IllegalArgumentException](
      TextAnalysis.bpeFertility(docs, "doc_id", col("text"), merges, Nil))
  }

  test("piiRedact: typed placeholders, pinned order, counts equal replacements") {
    val docs = Seq(
      (1L, "mail a@b.co or see https://x.io/q?user=c@d.ee plus 10.0.0.1 and +1 555-123-4567"),
      (2L, "no pii here"),
      (3L, "ip-ish 1234.5.6.7 and bare 5551234567")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getString(1) ==
      "mail <EMAIL> or see <URL> plus <IP> and <PHONE>", r1.getString(1))
    // the URL rule consumed c@d.ee: one email counted, not two
    assert((r1.getInt(2), r1.getInt(3), r1.getInt(4), r1.getInt(5)) == ((1, 1, 1, 1)))
    val r2 = out(2L)
    assert(r2.getString(1) == "no pii here" &&
      Seq(2, 3, 4, 5).forall(i => r2.getInt(i) == 0))
    // documented approximations: dotted-quad rule has no 0-255 range
    // check (suffix of 1234.5.6.7 matches); bare digits are NOT a phone
    val r3 = out(3L)
    assert(r3.getString(1) == "ip-ish 1<IP> and bare 5551234567", r3.getString(1))
    assert(r3.getInt(4) == 1 && r3.getInt(5) == 0)
  }

  test("domainGate: label-boundary suffix match, most-specific wins, nulls pass") {
    val hosts = Seq(
      (1L, Some("a.example.com")),      // under example.com
      (2L, Some("notexample.com")),     // substring, NOT a suffix match
      (3L, Some("example.com")),        // exact
      (4L, Some("deep.ads.example.com")), // two entries match -> longest
      (5L, Some("clean.org")),          // unblocked
      (6L, None)                        // no parseable host upstream
    ).toDF("doc_id", "host")
    val bl = Seq("EXAMPLE.com ", "ads.example.com", "spam.net").toDF("domain")
    val out = TextAnalysis.domainGate(hosts, "doc_id", col("host"), bl)
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(out(1L) == ((true, Some("example.com"))))
    assert(out(2L) == ((false, None)), "substring must not block")
    assert(out(3L) == ((true, Some("example.com"))))
    assert(out(4L) == ((true, Some("ads.example.com"))), "most specific entry wins")
    assert(out(5L) == ((false, None)))
    assert(out(6L) == ((false, None)), "null host passes unblocked")
    intercept[IllegalArgumentException](
      TextAnalysis.domainGate(hosts, "doc_id", col("host"),
        Seq("x.com").toDF("wrong_col")))
  }

  test("snippets: densest window wins, ties take the earliest anchor") {
    val docs = Seq(
      (1L, "alpha sort beta merge sort gamma"),
      (2L, "merge first then much later comes sort here"),
      (3L, "no query words at all")).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val out = TextAnalysis.snippets(docs, "doc_id", col("text"), idx,
        Seq("sort", "merge"), window = 2)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: hits at 1,3,4; [1,3] and [3,5] both cover 2 — earliest wins
    assert(out(0) === ((1L, 1, 2, "sort beta merge")))
    // doc 2: hits at 0,6; no window covers both -> first single-hit anchor
    assert(out(1) === ((2L, 0, 1, "merge first then")))
    assert(out.length === 2, "docs with no hits emit nothing")
  }

  test("snippetsMulti: greedy non-overlapping fragments in score order (X239)") {
    // hits at 0,1,2 / 5,6 / 10 with window 2: fragments (0,3), (5,2),
    // (10,1) in exactly that greedy order
    val docs = Seq(
      (1L, "a a a b b a a b b b a"),
      (2L, "b b a b b")  // one hit region -> one fragment
    ).toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    def rows(n: Int) = TextAnalysis.snippetsMulti(docs, "doc_id",
        col("text"), idx, Seq("a"), window = 2, nFrags = n)
      .orderBy(col("doc_id"), col("frag")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSeq
    assert(rows(3) === Seq(
      (1L, 1, 0, 3, "a a a"),
      (1L, 2, 5, 2, "a a b"),
      (1L, 3, 10, 1, "a"),
      (2L, 1, 2, 1, "a b b")))
    // nFrags cuts; frag 1 equals the X177 single-snippet pick
    assert(rows(1).map(t => (t._1, t._3, t._4)) === Seq((1L, 0, 3), (2L, 2, 1)))
    intercept[IllegalArgumentException](TextAnalysis.snippetsMulti(
      docs, "doc_id", col("text"), idx, Seq("a"), 2, 0))
    intercept[IllegalArgumentException](TextAnalysis.snippetsMulti(
      docs, "doc_id", col("text"), idx, Seq("a", "a"), 2, 2))
  }

  test("snippets: end-of-doc windows clip; only passed docs are served (refetch discipline)") {
    val docs = Seq((1L, "filler words then sort"), (2L, "sort merge"))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val out = TextAnalysis.snippets(docs.filter(col("doc_id") === 1L),
        "doc_id", col("text"), idx, Seq("sort"), window = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq === Seq((1L, 3, 1, "sort")),
      "window clips at doc end; unfetched hit docs are not emitted")
    intercept[IllegalArgumentException](
      TextAnalysis.snippets(docs, "doc_id", col("text"), idx, Nil, 2))
    intercept[IllegalArgumentException](
      TextAnalysis.snippets(docs, "doc_id", col("text"), idx, Seq("a", "a"), 2))
    intercept[IllegalArgumentException](
      TextAnalysis.snippets(docs, "doc_id", col("text"), idx, Seq("a"), -1))
  }

  test("fuzzySuggest: distance-1 matches found and ranked; no false accepts") {
    val docs = Seq(
      (1L, "sort merge spark sort"), (2L, "sort sparse"), (3L, "spore"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fuzzySuggest(docs, "doc_id", col("text"),
        Seq("sorrt", "SPARK", "zzz"), topK = 3)
      .orderBy(col("qterm"), col("rank")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    // sorrt: insertion-fix 'sort' (df 2), dist 1; 'sport' absent from vocab
    // SPARK lowercases: exact 'spark' rank 1 (dist 0), 'spore' is dist 2 -> out
    // 'sparse' is dist 2 from spark -> out; zzz matches nothing
    assert(out.toSeq === Seq(
      ("sorrt", "sort", 2L, 1, 1),
      ("spark", "spark", 1L, 0, 1)))
    intercept[IllegalArgumentException](
      TextAnalysis.fuzzySuggest(docs, "doc_id", col("text"), Nil, 3))
    intercept[IllegalArgumentException](
      TextAnalysis.fuzzySuggest(docs, "doc_id", col("text"), Seq("a", "a"), 3))
    intercept[IllegalArgumentException](
      TextAnalysis.fuzzySuggest(docs, "doc_id", col("text"), Seq("a"), 0))
  }

  test("phraseCandidates: per-slot corrections cross-multiply; keep-original fallback (X234)") {
    val docs = Seq(
      (1L, "sort merge spark sort"), (2L, "sort sparse merge"))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
      .groupBy(col("term")).agg(count_distinct(col("doc_id")).as("df"))
    val out = TextAnalysis.phraseCandidates(vocab,
        Seq("sorrt", "mergee", "zzz"), perTermK = 2)
      .orderBy(col("phrase")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // slot 1: sorrt -> {sort}; slot 2: mergee -> {merge}; slot 3: zzz
    // has no distance-1 candidate -> keeps itself (n_changes counts
    // only real corrections)
    assert(out === Seq(("sort merge zzz", 2L)))
    // a well-spelled slot keeps itself as option 1 (dist 0 ranks first)
    val ok = TextAnalysis.phraseCandidates(vocab,
        Seq("sort", "merge"), perTermK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ok === Seq(("sort merge", 0L)))
    // an OOV slot WITH an in-vocab correction does NOT keep itself —
    // the fallback is only for slots with no candidate at all
    val wide = TextAnalysis.phraseCandidates(vocab, Seq("sport"), perTermK = 2)
      .orderBy(col("phrase")).collect().map(_.getString(0)).toSeq
    assert(wide === Seq("sort"))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseCandidates(vocab, Nil, 2))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseCandidates(vocab, Seq("a"), 0))
    intercept[IllegalArgumentException](
      TextAnalysis.phraseCandidates(vocab, Seq.fill(20)("a"), 8))
  }

  test("percolate: arriving docs match stored queries; parity with per-query booleanMatch (X208)") {
    val docs = Seq(
      (1L, "sort merge spark"),
      (2L, "sort merge join spark"),
      (3L, "sort merge bubble spark"),
      (4L, "sort merge plain"),
      (5L, "sort spark join")).toDF("doc_id", "text")
    val clauses = Seq(
      ("alert1", "sort", "must"), ("alert1", "merge", "must"),
      ("alert1", "spark", "should"), ("alert1", "bubble", "must_not"),
      ("alert2", "join", "must")).toDF("query_id", "term", "clause")
    val got = TextAnalysis.percolate(docs, "doc_id", col("text"), clauses)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // parity: each stored query percolates exactly its booleanMatch set
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val w1 = TextAnalysis.booleanMatch(idx, Seq("sort", "merge"),
        Seq("spark"), Seq("bubble")).collect()
      .map(r => ("alert1", r.getLong(0), r.getLong(1))).toSet
    val w2 = TextAnalysis.booleanMatch(idx, Seq("join")).collect()
      .map(r => ("alert2", r.getLong(0), r.getLong(1))).toSet
    assert(got == (w1 ++ w2))
    assert(got.map(_._1) == Set("alert1", "alert2"))
    // contract surfaces at the percolate entry too
    intercept[IllegalArgumentException](TextAnalysis.percolate(
      docs, "doc_id", col("text"),
      Seq(("q", "x", "nope")).toDF("query_id", "term", "clause")))
    intercept[IllegalArgumentException](TextAnalysis.percolate(
      docs, "doc_id", col("text"),
      Seq(("q", "x", "must_not")).toDF("query_id", "term", "clause")))
  }

  test("booleanMatch: must/should/mustNot set algebra; clause edges; bad args") {
    val docs = Seq(
      (1L, "sort merge spark"),          // must ✓ should(spark) ✓
      (2L, "sort merge join spark"),     // must ✓ should×2
      (3L, "sort merge bubble spark"),   // mustNot kills it
      (4L, "sort merge plain"),          // no should term
      (5L, "sort spark join")).toDF("doc_id", "text") // missing 'merge'
    val idx = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    def run(must: Seq[String], should: Seq[String], not: Seq[String],
        minShould: Int = 1) =
      TextAnalysis.booleanMatch(idx, must, should, not, minShould)
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(Seq("sort", "merge"), Seq("spark", "join"), Seq("bubble"))
      === Seq((1L, 1L), (2L, 2L)))
    assert(run(Seq("sort", "merge"), Seq("spark", "join"), Seq("bubble"),
      minShould = 2) === Seq((2L, 2L)))
    // no should clause: vacuously satisfied, pure AND-NOT
    assert(run(Seq("sort", "merge"), Nil, Seq("bubble"))
      .map(_._1) === Seq(1L, 2L, 4L))
    // no must clause: pure OR over should
    assert(run(Nil, Seq("join"), Nil).map(_._1) === Seq(2L, 5L))
    intercept[IllegalArgumentException](run(Nil, Nil, Seq("x")))
    intercept[IllegalArgumentException](
      run(Seq("sort"), Seq("sort"), Nil)) // term in two clauses
    intercept[IllegalArgumentException](
      run(Seq("sort"), Seq("spark"), Nil, minShould = 2))
  }

  test("prefixSuggest: per-prefix top-k by (df DESC, term ASC); case folds; empty prefix rejected") {
    val vocab = Seq(
      ("sort", 5L), ("sorted", 5L), ("sorting", 2L), ("sober", 1L),
      ("merge", 3L), ("spark", 4L)).toDF("term", "df")
    val out = TextAnalysis.prefixSuggest(vocab, Seq("SO", "mer", "zz"), topK = 3)
      .orderBy(col("prefix"), col("rank")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      ("mer", "merge", 3L, 1),
      // df ties break lexicographically; 'sober' loses the top-3 cut
      ("so", "sort", 5L, 1), ("so", "sorted", 5L, 2), ("so", "sorting", 2L, 3)))
    intercept[IllegalArgumentException](TextAnalysis.prefixSuggest(vocab, Nil, 3))
    intercept[IllegalArgumentException](
      TextAnalysis.prefixSuggest(vocab, Seq(""), 3))
    intercept[IllegalArgumentException](
      TextAnalysis.prefixSuggest(vocab, Seq("a", "a"), 3))
    intercept[IllegalArgumentException](
      TextAnalysis.prefixSuggest(vocab, Seq("a"), 0))
  }

  test("fuzzySuggest: deletion-neighborhood candidates equal the brute-force cross join") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def word() = (1 to (1 + rnd.nextInt(4)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (1L to 30L).map(i => (i, Seq.fill(4)(word()).mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq("ab", "abc", "ca", "bb").distinct
    val got = TextAnalysis.fuzzySuggest(docs, "doc_id", col("text"),
        queries, topK = 100)
      .select(col("qterm"), col("term"), col("dist")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // brute force: every (query, vocab) pair within levenshtein 1
    val vocab = docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val want = (for (q <- queries; t <- vocab; d = lev(q, t) if d <= 1)
      yield (q, t, d)).toSet
    assert(got === want,
      "neighborhood join + verify must equal the exact cross-join answer")
  }

  test("bm25SynTopK: singleton groups == bm25TopK; group blends tf-sum/df-max") {
    val docs = Seq(
      (1L, "sort merge sort x"),
      (2L, "order merge y z"),
      (3L, "sort order q q"),
      (4L, "q q q q")
    ).toDF("doc_id", "text")
    // singleton groups must be bit-identical to the plain surface
    val plain = TextAnalysis.bm25TopK(docs, "doc_id", col("text"),
      Seq("sort", "merge"), k = 10).collect().toSeq
    val single = TextAnalysis.bm25SynTopK(docs, "doc_id", col("text"),
      Seq(Seq("sort"), Seq("merge")), k = 10).collect().toSeq
    assert(plain === single)
    // (sort|order) as one concept: doc 3 has group-tf 2 like doc 1;
    // group df = max(df_sort=2, df_order=2) = 2
    val syn = TextAnalysis.bm25SynTopK(docs, "doc_id", col("text"),
        Seq(Seq("sort", "order"), Seq("merge")), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def part(tf: Double, df: Double, dl: Double): BigDecimal = {
      val n = 4.0; val avgdl = 16.0 / 4.0
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      BigDecimal.valueOf(idf * tf * 2.2 / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def score(ps: Seq[BigDecimal]) =
      BigDecimal.valueOf(ps.map(_.toDouble).reduce(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = syn.map(t => t._1 -> t._3).toMap
    // group (sort|order): df = max(2, 2) = 2; merge: df = 2
    assert(byId(1L) == score(Seq(part(2, 2, 4), part(1, 2, 4))))
    assert(byId(3L) == score(Seq(part(2, 2, 4))))
    assert(byId(2L) == score(Seq(part(1, 2, 4), part(1, 2, 4))))
    assert(!byId.contains(4L), "no group term -> zero score -> absent")
    // an ABSENT member must not perturb the group (df-max ignores df=0)
    val withAbsent = TextAnalysis.bm25SynTopK(docs, "doc_id", col("text"),
      Seq(Seq("sort", "order", "zzz"), Seq("merge")), k = 10).collect().toSeq
    val without = TextAnalysis.bm25SynTopK(docs, "doc_id", col("text"),
      Seq(Seq("sort", "order"), Seq("merge")), k = 10).collect().toSeq
    assert(withAbsent === without)
    // contract: cross-group duplicate / empty group / empty input rejected
    intercept[IllegalArgumentException](TextAnalysis.bm25SynTopK(
      docs, "doc_id", col("text"), Seq(Seq("sort"), Seq("sort", "x")), 10))
    intercept[IllegalArgumentException](TextAnalysis.bm25SynTopK(
      docs, "doc_id", col("text"), Seq(Seq("sort"), Seq()), 10))
    intercept[IllegalArgumentException](TextAnalysis.bm25SynTopK(
      docs, "doc_id", col("text"), Seq(), 10))
  }

  test("significantTerms: JLH lift, superset background, minDf gate, fg<=bg excluded") {
    val docs = Seq(
      (1L, "de", "apfel apfel kern"),  // df counts docs, not occurrences
      (2L, "de", "apfel baum"),
      (3L, "en", "apple tree kern"),
      (4L, "en", "apple core baum")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.significantTerms(docs, "doc_id", col("text"),
        col("lang") === "de", n = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byTerm = got.map(t => t._1 -> t).toMap
    // apfel: fg 2/2 = 1.0, bg 2/4 = 0.5 -> (0.5)·(2.0) = 1.0
    assert(byTerm("apfel") === (("apfel", 2L, 2L, 1.0)))
    // kern: fg 1/2 = 0.5, bg 2/4 = 0.5 -> lift 0 -> excluded
    assert(!byTerm.contains("kern"))
    // baum: fg 1/2 = 0.5, bg 2/4 = 0.5 -> excluded too
    assert(!byTerm.contains("baum"))
    // english-only terms have fg% = 0 -> excluded
    assert(!byTerm.contains("apple") && !byTerm.contains("tree"))
    // minDf gates the foreground df: apfel (df_fg 2) survives, nothing else
    val gated = TextAnalysis.significantTerms(docs, "doc_id", col("text"),
      col("lang") === "de", n = 10, minDf = 2L).collect().map(_.getString(0)).toSeq
    assert(gated === Seq("apfel"))
    // empty foreground -> empty result, not division noise
    assert(TextAnalysis.significantTerms(docs, "doc_id", col("text"),
      col("lang") === "xx", 10).collect().isEmpty)
    intercept[IllegalArgumentException](TextAnalysis.significantTerms(
      docs, "doc_id", col("text"), col("lang") === "de", 0))
    intercept[IllegalArgumentException](TextAnalysis.significantTerms(
      docs, "doc_id", col("text"), col("lang") === "de", 5, 0L))
  }

  test("spanFirst: position gate, first occurrence wins, later-only docs absent") {
    val docs = Seq(
      (1L, "sort merge sort"),  // pos 0 and 2 -> n_hits 2 (end=3), first 0
      (2L, "a b sort"),         // pos 2 < 3 -> hit, first 2
      (3L, "a b c sort"),       // pos 3 -> absent at end=3
      (4L, "no match")
    ).toDF("doc_id", "text")
    val p = TextAnalysis.positionalPostings(docs, "doc_id", col("text"))
    val got = TextAnalysis.spanFirst(p, "sort", end = 3)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, 2L, 0), (2L, 1L, 2)))
    // end=4 admits doc 3
    assert(TextAnalysis.spanFirst(p, "sort", 4).collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L))
    intercept[IllegalArgumentException](TextAnalysis.spanFirst(p, "", 3))
    intercept[IllegalArgumentException](TextAnalysis.spanFirst(p, "sort", 0))
  }

  test("bm25fTopK: title hit outranks body hit; single-field degenerates to bm25 ranking") {
    val docs = Seq(
      (1L, "x a b c d"), // x in head
      (2L, "a b c d x"), // x in body (headLen=4)
      (3L, "a b c d e")  // no x
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25fTopK(docs, "doc_id", col("text"),
        headLen = 4, Seq("x"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L),
      "head hit (weight 2) must outrank the body hit; no-hit doc absent")
    assert(out.forall(r => r._2 + r._3 == 5L), "dlh + dlb == dl")
    // headLen >= every dl + equal field params = single-field BM25F:
    // rank order must equal plain bm25's (scores differ by the (k1+1)
    // factor bm25f's saturation form drops — rank-equivalent)
    val docs2 = Seq((1L, "x y x z"), (2L, "x q q q"), (3L, "q q")).toDF("doc_id", "text")
    val f = TextAnalysis.bm25fTopK(docs2, "doc_id", col("text"), headLen = 99,
      Seq("x", "y"), k = 10, wHead = 1.0, wBody = 1.0).collect().map(_.getLong(0)).toSeq
    val p = TextAnalysis.bm25TopK(docs2, "doc_id", col("text"),
      Seq("x", "y"), k = 10).collect().map(_.getLong(0)).toSeq
    assert(f === p)
    intercept[IllegalArgumentException](TextAnalysis.bm25fTopK(
      docs, "doc_id", col("text"), 0, Seq("x"), 10))
    intercept[IllegalArgumentException](TextAnalysis.bm25fTopK(
      docs, "doc_id", col("text"), 4, Seq("x", "x"), 10))
  }

  test("categorizeText: digit-variant lines cluster, punctuation splits, example deterministic (X286)") {
    val spark2 = spark
    import spark2.implicits._
    val logs = Seq(
      "GET /api/user/1234 took 56ms",
      "GET /api/user/99 took 7ms",
      "GET /api/user/7   took 81ms", // extra whitespace collapses
      "GET /api/user=55 took 3ms",   // '=' vs '/' is structure: new template
      "Cache miss",
      "CACHE MISS",                  // case folds into the same template
      "12345",                       // masks to '<n>' — still a template
      " \t ")                        // empty after masking: drops
      .toDF("line")
    val got = TextAnalysis.categorizeText(logs, col("line"))
      .orderBy(col("template"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === Seq(
      ("<n>", 1L, "12345"),
      ("cache miss", 2L, "CACHE MISS"),
      ("get /api/user/<n> took <n>ms", 3L, "GET /api/user/1234 took 56ms"),
      ("get /api/user=<n> took <n>ms", 1L, "GET /api/user=55 took 3ms")))
    // NFC: composed and decomposed 'café' land in one template
    val nfcLogs = Seq("cafe\u0301 opened 5", "caf\u00e9 opened 77").toDF("line")
    val one = TextAnalysis.categorizeText(nfcLogs, col("line")).collect()
    assert(one.length === 1 && one.head.getLong(1) === 2L,
      "NFC must unify composed/decomposed forms before templating")
  }

  test("unigramSegmented: Viterbi picks the cheapest path, ties to the smallest split point (X288)") {
    val spark2 = spark
    import spark2.implicits._
    def seg(w: String, model: Seq[(String, Double)]): Seq[String] =
      TextAnalysis.unigramSegmented(Seq(w).toDF("w"), col("w"), model, 4)
        .select(col("pieces")).head().getSeq[String](0)
    def m(ps: (String, Double)*): Seq[(String, Double)] = ps
    // 'ab' cheaper than a+b: one piece wins
    assert(seg("abab", m("a" -> 1.0, "b" -> 2.0, "ab" -> 0.5)) ===
      Seq("ab", "ab"))
    // 'ab' more expensive than a+b: chars win
    assert(seg("ab", m("a" -> 1.0, "b" -> 1.0, "ab" -> 3.0)) ===
      Seq("a", "b"))
    // exact tie (cost(ab) == cost(a)+cost(b)): the SMALLEST split point
    // rule keeps j=0 for dp[2] — the whole 'ab' piece
    assert(seg("ab", m("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)) === Seq("ab"))
    // maxPieceLen bounds the edges: a 5-char piece can't be used at len 4
    assert(seg("abcde", m("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "abcde" -> 0.1)) ===
      Seq("a", "b", "c", "d", "e"))
    // unreachable word (a char missing from the model) -> null pieces
    val out = TextAnalysis.unigramSegmented(
      Seq("axb").toDF("w"), col("w"), m("a" -> 1.0, "b" -> 1.0), 4)
    assert(out.filter(col("pieces").isNull).count() === 1)
    intercept[IllegalArgumentException](TextAnalysis.unigramSegmented(
      Seq("a").toDF("w"), col("w"), m("a" -> 1.0, "a" -> 2.0), 4))
    intercept[IllegalArgumentException](TextAnalysis.unigramSegmented(
      Seq("a").toDF("w"), col("w"), m("a" -> 1.0), 0))
  }

  test("unigramLearn: seed census + chars, hard-EM recount, multi-char prune, char smoothing (X288)") {
    val spark2 = spark
    import spark2.implicits._
    // corpus tokens: abab x2, ab x1
    val docs = Seq((1L, "abab abab"), (2L, "ab")).toDF("doc_id", "text")
    val trace = TextAnalysis.unigramLearn(docs, "doc_id", col("text"),
      seedSize = 3, numIters = 2, maxPieceLen = 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val it0 = trace.filter(_._1 == 0).map(t => t._2 -> t._3).toMap
    // substring census, occurrence-weighted: 'abab' (freq 2) yields
    // a,b x2 each, ab x2, ba, aba, bab, abab x1 each; 'ab' adds a, b, ab
    assert(it0("a") === 5L && it0("b") === 5L && it0("ab") === 5L)
    // top-3 by (cnt desc, piece asc) = a, ab, b; both chars already in
    assert(trace.filter(_._1 == 0).map(_._2).sorted.toSeq ===
      Seq("a", "ab", "b"))
    // EM round 1: every word segments as ab|ab / ab (one piece beats two
    // equal-prob pieces), so counts: ab = 2*2+1 = 5; a, b unused -> the
    // char smoothing floor keeps them at 1
    val it1 = trace.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    assert(it1 === Map("a" -> 1L, "b" -> 1L, "ab" -> 5L))
    // probs sum to ~1 at every iter
    Seq(0, 1, 2).foreach { k =>
      val s = trace.filter(_._1 == k).map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-3, s"iter $k prob mass $s")
    }
    // the fixture converges after one round
    val it2 = trace.filter(_._1 == 2).map(t => t._2 -> t._3).toMap
    assert(it2 === it1)
    intercept[IllegalArgumentException](TextAnalysis.unigramLearn(
      docs, "doc_id", col("text"), 0, 1))
    intercept[IllegalArgumentException](TextAnalysis.unigramLearn(
      docs, "doc_id", col("text"), 3, 9))
  }

  test("differential: unigramLearn matches an in-memory reference on random corpora (X288)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(19)
    val alphabet = "abcd"
    def word() =
      Seq.fill(1 + rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (1L to 12L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(8))(word()).mkString(" ")
    }
    val (seedSize, iters, maxLen) = (8, 2, 3)
    // in-memory reference: same seed census, Viterbi (first-minimal
    // split), recount, prune, smoothing — independent implementation
    val freq = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val census = freq.toSeq.flatMap { case (w, f) =>
      for (s <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - s))
        yield (w.substring(s, s + l), f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val top = census.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var vocab = (top ++ census.filter(_._1.length == 1)).toMap
    def viterbi(w: String, cost: Map[String, Double]): Seq[String] = {
      val inf = 1e18
      val dp = Array.fill(w.length + 1)((inf, -1)); dp(0) = (0.0, -1)
      for (i <- 1 to w.length; j <- math.max(0, i - maxLen) until i) {
        cost.get(w.substring(j, i)).foreach { c =>
          if (dp(j)._1 < inf && dp(j)._1 + c < dp(i)._1) dp(i) = (dp(j)._1 + c, j)
        }
      }
      var pos = w.length; val out = scala.collection.mutable.ListBuffer[String]()
      while (pos > 0) { val j = dp(pos)._2; w.substring(j, pos) +=: out; pos = j }
      out.toSeq
    }
    val expect = scala.collection.mutable.Map[Int, Map[String, Long]](0 -> vocab)
    for (k <- 1 to iters) {
      val tot = vocab.values.sum.toDouble
      val cost = vocab.map { case (p, c) => p -> -math.log(c / tot) }
      val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      freq.foreach { case (w, f) =>
        viterbi(w, cost).foreach(p => counts(p) += f)
      }
      vocab = vocab.keys.flatMap { p =>
        val c = counts(p)
        if (p.length == 1) Some(p -> (c + 1L))
        else if (c > 0L) Some(p -> c) else None
      }.toMap
      expect(k) = vocab
    }
    val got = TextAnalysis.unigramLearn(docs.toDF("doc_id", "text"),
        "doc_id", col("text"), seedSize, iters, maxLen)
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap).toMap
    (0 to iters).foreach { k =>
      assert(got(k) === expect(k), s"iter $k diverged")
    }
  }

  test("unigramLearn: a multi-char piece that wins zero occurrences prunes and stays out (X288)") {
    val spark2 = spark
    import spark2.implicits._
    // 'xy' appears as a substring (census) but 'x'/'y' are individually
    // MUCH more frequent via other words, so after round 1 the rare
    // pair segments through the chars and 'xy' prunes
    val docs = Seq((1L, "x x x x y y y y xy")).toDF("doc_id", "text")
    val trace = TextAnalysis.unigramLearn(docs, "doc_id", col("text"),
      seedSize = 3, numIters = 1, maxPieceLen = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(trace.filter(_._1 == 0).map(_._2).toSet === Set("x", "y", "xy"))
    // round 1: 'xy' costs -ln(1/11) > -ln(5/11)-ln(5/11)? No: chars are
    // cheap enough that x+y (2 pieces) beats xy at these counts
    val it1 = trace.filter(_._1 == 1).map(t => t._2 -> t._3).toMap
    assert(!it1.contains("xy"), s"zero-occurrence multi-char must prune: $it1")
    assert(it1("x") === 6L && it1("y") === 6L,
      "chars absorb the pair's occurrences (+1 smoothing)")
  }
}
