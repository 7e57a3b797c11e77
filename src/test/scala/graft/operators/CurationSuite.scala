package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corpusFreqScore: hand-computed unigram probabilities on a fixture") {
    // corpus: a a b | b c  ->  ctf: a=2 b=2 c=1, T=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Curation.corpusFreqScore(docs, "doc_id", col("text"))
      .orderBy($"doc_id").collect()
    // d1: (2*2 + 1*2) / (3*5) = 0.4 ; d2: (1*2 + 1*1) / (2*5) = 0.3
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 3L, 0.4), (2L, 2L, 0.3)))
  }

  test("corpusFreqScore: empty tokens drop; a doc of only whitespace yields no row") {
    val docs = Seq((1L, "x"), (2L, "   ")).toDF("doc_id", "text")
    val out = Curation.corpusFreqScore(docs, "doc_id", col("text"))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("differential: corpusFreqScore equals a naive in-memory computation on random docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val toks = docs.map { case (id, text) => id -> text.split("\\s+").toSeq }
    val ctf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = ctf.values.sum.toDouble
    val expected = toks.map { case (id, ts) =>
      val score = ts.map(t => ctf(t).toDouble).sum / (ts.size * total)
      id -> ((ts.size.toLong, math.rint(score * 1e6) / 1e6))
    }.toMap

    val got = Curation.corpusFreqScore(docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, s)) =>
      assert(n === expected(id)._1, s"doc $id token count")
      // the engine sums tf*ctf exactly then divides once; the naive fold
      // sums doubles — identical here because every addend is an integer
      // well under 2^53, but compare with an epsilon for the rounding step
      assert(math.abs(s - expected(id)._2) < 1e-9, s"doc $id: $s vs ${expected(id)._2}")
    }
  }

  test("capPerKey keeps the first n per key in order and ranks them") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("k", "v")
    val out = Curation.capPerKey(df, $"k", 2, $"v")
      .orderBy($"k", $"v").as[(String, Int, Int)].collect().toSeq
    assert(out === Seq(("a", 1, 1), ("a", 2, 2), ("b", 9, 1)))
  }

  test("capPerKey rejects a non-positive cap, a missing order, and an rn collision") {
    val df = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] { Curation.capPerKey(df, $"k", 0, $"v") }
    intercept[IllegalArgumentException] { Curation.capPerKey(df, $"k", 2) }
    intercept[IllegalArgumentException] {
      Curation.capPerKey(df.withColumn("rn", lit(1)), $"k", 2, $"v")
    }
  }

  test("balancedSample: smallest key keeps everything; larger keys downsample toward its mass") {
    import graft.util.Sampling
    val docs = ((1L to 50L).map(i => (i, "small", 10L)) ++
      (100L to 299L).map(i => (i, "big", 10L))).toDF("doc_id", "src", "n")
    val kept = Curation.balancedSample(docs, $"src", $"doc_id", $"n")
      .select($"doc_id", $"src").as[(Long, String)].collect()
    val (small, big) = kept.partition(_._2 == "small")
    assert(small.length === 50, "the smallest key's rate is exactly 1.0")
    // big: threshold floor(500/2000*10000) = 2500 -> exactly the docs whose
    // hash bucket < 2500; recompute the expected membership via the gate
    val expectedBig = docs.filter($"src" === "big")
      .filter(Sampling.hashBucket($"doc_id") < 2500)
      .select($"doc_id").as[Long].collect().toSet
    assert(big.map(_._1).toSet === expectedBig)
    assert(expectedBig.nonEmpty && expectedBig.size < 200)
  }

  test("balancedSample: a key over 10000x the smallest rounds to rate 0 (documented floor)") {
    val docs = (Seq((1L, "tiny", 1L)) ++
      (10L until 20L).map(i => (i, "huge", 2000L))).toDF("doc_id", "src", "n")
    val kept = Curation.balancedSample(docs, $"src", $"doc_id", $"n")
      .select($"src").as[String].collect()
    assert(kept.toSeq === Seq("tiny"), "floor(1/20000*10000) = 0 -> huge contributes nothing")
  }

  test("balancedSample: null keys form their own group; zero-mass keys never poison the min") {
    val docs = Seq(
      (1L, Option.empty[String], 10L), (2L, None, 10L),      // null-key group, mass 20
      (3L, Some("a"), 10L), (4L, Some("a"), 10L),            // mass 20
      (5L, Some("empty"), 0L), (6L, Some("empty"), 0L)       // mass 0: excluded, not min
    ).toDF("doc_id", "src", "n")
    val kept = Curation.balancedSample(docs, $"src", $"doc_id", $"n")
      .select($"doc_id").as[Long].collect().toSet
    // null group and "a" both have mass 20 = min -> rate 1.0 -> all kept;
    // zero-mass docs contribute nothing and are dropped
    assert(kept === Set(1L, 2L, 3L, 4L), kept.toString)
  }

  test("shardShuffle: deterministic per seed, shards in range, seeds independent") {
    val df = (0L until 200L).toDF("id")
    val a = Curation.shardShuffle(df, "id", nShards = 8, seed = "s1")
      .orderBy($"id").collect()
    val b = Curation.shardShuffle(df, "id", nShards = 8, seed = "s1")
      .orderBy($"id").collect()
    assert(a.toSeq === b.toSeq, "same seed must reproduce the permutation exactly")
    val shards = a.map(_.getInt(a.head.fieldIndex("shard")))
    assert(shards.forall(s => s >= 0 && s < 8))
    assert(shards.distinct.length == 8, "200 ids over 8 shards should hit every shard")
    val c = Curation.shardShuffle(df, "id", nShards = 8, seed = "s2")
      .orderBy($"id").collect()
    assert(a.map(_.getString(1)).toSeq !== c.map(_.getString(1)).toSeq,
      "a different seed must give a different permutation")
  }

  test("shardShuffle: within-shard key order is a real shuffle (not id order)") {
    val df = (0L until 64L).toDF("id")
    val out = Curation.shardShuffle(df, "id", nShards = 2, seed = "s1")
      .filter($"shard" === 0).orderBy($"shuffle_key")
      .select($"id").as[Long].collect().toSeq
    assert(out.sorted !== out, "md5 order should not equal id order")
  }

  test("adaptiveQualityCutoff: kept set is exactly the scores at/above the percentile") {
    val stops = TextAnalysis.stopwords("en")
    val docs = (1L to 30L).map { i =>
      // longer docs with more stopwords score higher -> a real score spread
      val words = (1 to i.toInt).map(j => if (j % 3 == 0) stops((j / 3) % 10) else s"w$j")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val scored = docs.select($"doc_id", TextAnalysis.qualityScore($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val out = Curation.adaptiveQualityCutoff(docs, "doc_id", $"text", keepFrac = 0.8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val cutoff = out.head._3
    assert(out.forall(_._2 >= cutoff), "every kept score clears the cutoff")
    assert(out.map(_._1).toSet === scored.filter(_._2 >= cutoff).keySet,
      "kept set = exactly the docs at/above the cutoff")
    assert(out.length >= 24 && out.length < 30, s"~top-80% kept, got ${out.length}")
    val all = Curation.adaptiveQualityCutoff(docs, "doc_id", $"text", keepFrac = 1.0)
    assert(all.count() === 30, "keepFrac=1 keeps everything (cutoff = min score)")
  }

  test("adaptiveQualityCutoff approx: GK rank-error bound on the cutoff; kept fraction tracks") {
    val stops = TextAnalysis.stopwords("en")
    val n = 200
    val docs = (1L to n.toLong).map { i =>
      val words = (1 to i.toInt).map(j => if (j % 3 == 0) stops((j / 3) % 10) else s"w$j")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sorted = docs.select(TextAnalysis.qualityScore($"text").as("s"))
      .collect().map(_.getDouble(0)).sorted
    for (accuracy <- Seq(50, 10000)) {
      val out = Curation.adaptiveQualityCutoff(docs, "doc_id", $"text",
        keepFrac = 0.8, approx = true, accuracy = accuracy).collect()
      val cutoff = out.head.getDouble(2)
      // percentile_approx returns an ACTUAL element whose rank is within
      // n/accuracy of the target rank (GK guarantee)
      val err = math.ceil(n.toDouble / accuracy).toInt
      val target = (0.2 * (n - 1)).round.toInt
      val lo = sorted(math.max(0, target - err - 1))
      val hi = sorted(math.min(n - 1, target + err + 1))
      assert(cutoff >= lo && cutoff <= hi,
        s"accuracy=$accuracy cutoff $cutoff outside rank window [$lo, $hi]")
      assert(out.forall(_.getDouble(1) >= cutoff), "kept rows clear the approx cutoff")
      val kept = out.length.toDouble / n
      assert(math.abs(kept - 0.8) <= (err + 2).toDouble / n,
        s"accuracy=$accuracy kept fraction $kept deviates past the rank error")
    }
  }

  // ---- mixtureSample ----------------------------------------------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("differential: mixtureSample equals the naive greedy fill per source") {
    val rnd = new scala.util.Random(7)
    val sources = Vector("web", "code", "books", "junk")
    val docs = (1L to 120L).map(id =>
      (id, sources(rnd.nextInt(sources.size)), 1L + rnd.nextInt(40)))
    val budgets = Seq("web" -> 200L, "code" -> 120L, "books" -> 1L)
    val expected = budgets.flatMap { case (src, budget) =>
      var cum = 0L
      docs.filter(_._2 == src)
        .sortBy { case (id, _, _) => (md5Hex(s"$id:mx"), id) }
        .flatMap { case (id, _, tk) =>
          cum += tk
          if (cum <= budget) Some((id, src, tk, cum)) else None
        }
    }.toSet
    val got = Curation.mixtureSample(
      docs.toDF("doc_id", "source", "tk"), $"source", "doc_id", $"tk",
      budgets, seed = "mx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // "junk" is outside the mixture: nothing from it may leak through
    assert(!got.exists(_._2 == "junk"))
    // a budget below the smallest doc keeps nothing from that source
    assert(!got.exists(_._2 == "books"))
  }

  test("mixtureSample: first over-budget doc is cut whole, not truncated") {
    // md5 order is opaque; with equal token counts the cut point is exact:
    // 5 docs x 10 tokens against budget 35 -> exactly 3 kept, cum 10/20/30
    val docs = (1L to 5L).map(id => (id, "s", 10L)).toDF("doc_id", "source", "tk")
    val out = Curation.mixtureSample(docs, $"source", "doc_id", $"tk",
      Seq("s" -> 35L)).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(3)).sorted.toSeq === Seq(10L, 20L, 30L))
  }

  test("mixtureSample is deterministic and seed-sensitive") {
    val docs = (1L to 60L).map(id => (id, "s", 1L + id % 7)).toDF("doc_id", "source", "tk")
    def ids(seed: String) = Curation.mixtureSample(docs, $"source", "doc_id", $"tk",
      Seq("s" -> 40L), seed).select("doc_id").as[Long].collect().toSet
    assert(ids("e0") === ids("e0"), "same seed, same sample")
    assert(ids("e0") !== ids("e1"), "different seed should pick a different prefix")
  }

  // ---- gopherGate -------------------------------------------------------

  private def gateMap(rows: Seq[(Long, String)], minTokens: Int = 20) =
    Curation.gopherGate(rows.toDF("doc_id", "text"), "doc_id", col("text"),
      minTokens = minTokens)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap

  test("gopherGate: first failing rule wins; clean docs keep with NULL reason") {
    val stops = "the a of and to in is for on with"
    val out = gateMap(Seq(
      // fails too_short AND few_stopwords -> too_short (rule order)
      1L -> "tiny doc",
      // 20+ tokens, stopwords present, varied text -> kept
      2L -> s"$stops quick brown fox jumps over lazy dog near river bank today",
      // 20+ tokens but zero stopwords -> few_stopwords
      3L -> (1 to 22).map(i => s"tok$i").mkString(" ")))
    assert(out(1L) === ((false, Some("too_short"))))
    assert(out(2L) === ((true, None)))
    assert(out(3L) === ((false, Some("few_stopwords"))))
  }

  test("gopherGate: repetition and word-length rules fire before the stopword rule") {
    // 24 tokens = 8x the same trigram -> dup_ngram_frac = (22-3)/22 >> 0.05;
    // mean token length 11/3 ~ 3.67 clears the word-length band and the
    // phrase contains stopwords, so only `repetition` can fire
    val repeated = Seq.fill(8)("the cats with").mkString(" ")
    // 25 twelve-char words: avg chars/token ~ 13 > 10 -> word_len_high
    // (checked before few_stopwords, which this doc also fails)
    val longWords = Seq.fill(25)("abcdefghijkl").mkString(" ")
    val out = gateMap(Seq(1L -> repeated, 2L -> longWords))
    assert(out(1L) === ((false, Some("repetition"))))
    assert(out(2L) === ((false, Some("word_len_high"))))
  }

  test("deflateRatio: repetitive < organic < random; exact byte accounting; empty doc 1.0") {
    val rnd = new scala.util.Random(7)
    val organic = "the quick brown fox jumps over a lazy dog while rain falls " * 20
    val docs = Seq(
      (1L, "spam " * 400),                                        // highly repetitive
      (2L, organic),                                              // organic prose
      (3L, rnd.alphanumeric.take(2000).mkString),                 // high entropy
      (4L, "")).toDF("doc_id", "text")
    val got = Curation.deflateRatio(docs, "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L)._3 < got(2L)._3 && got(2L)._3 < got(3L)._3,
      s"monotonicity broken: $got")
    assert(got(1L)._3 < 0.05, "repetition must crater the ratio")
    assert(got(4L) == ((0L, got(4L)._2, 1.0)), "empty doc: 0 bytes, ratio 1.0")
    got.foreach { case (id, (nb, nd, ratio)) =>
      if (nb > 0) {
        val want = BigDecimal.valueOf(nd.toDouble / nb)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(ratio == want, s"doc $id ratio $ratio != $nd/$nb")
      }
    }
    // deterministic across runs (fixed JVM zlib)
    val again = Curation.deflateRatio(docs, "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.view.mapValues(_._2).toMap)
  }

  test("deflateRatio: a null (or non-castable) doc id drops the row, not the scan") {
    val docs = Seq(
      (Option("7"), "healthy row"),
      (None, "null id must not NPE the task"),
      (Option("not-a-number"), "cast-to-null id must not NPE either"))
      .toDF("doc_id", "text")
    val got = Curation.deflateRatio(docs, "doc_id", $"text")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(7L), s"got ${got.toSeq}")
  }

  test("mixturePlan: rates realize targets, scarce source capped at 1.0 with deficit") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 100L),    // a: 200 tokens available
      (3L, "b", 30L),                      // b: 30 tokens — scarce
      (4L, "c", 500L)                      // c: not in targets -> dropped
    ).toDF("doc_id", "src", "tk")
    val got = Curation.mixturePlan(docs, col("src"), col("tk"),
        targets = Seq("a" -> 0.5, "b" -> 0.5), totalBudget = 200L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      // a: target 100 of 200 avail -> rate 0.5, no deficit
      ("a", 2L, 200L, 0.5, 100L, 0.5, 0L),
      // b: target 100 of 30 avail -> keep all, 70 short
      ("b", 1L, 30L, 0.5, 100L, 1.0, 70L)), s"got ${got.toSeq}")
    assert(!got.exists(_._1 == "c"), "undeclared source must not appear")
    intercept[IllegalArgumentException](
      Curation.mixturePlan(docs, col("src"), col("tk"), Seq("a" -> 0.4), 100L))
  }

  test("mixtureDrift: smoothed shares, hand-computed KL/JS terms, one-sided sources finite") {
    val oldDocs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("doc_id", "source")
    val newDocs = Seq((1L, "a"), (2L, "a"), (5L, "a"), (6L, "c")).toDF("doc_id", "source")
    val got = Curation.mixtureDrift(oldDocs, newDocs, col("source"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // totals 4 old / 4 new, 3 union sources -> denominator 7 both sides
    def so(n: Long) = (n + 1).toDouble / 7.0
    def kl(no: Long, nn: Long) = r6(so(nn) * math.log(so(nn) / so(no)))
    def js(no: Long, nn: Long) = {
      val m = (so(no) + so(nn)) / 2.0
      r6(0.5 * (so(no) * math.log(so(no) / m) + so(nn) * math.log(so(nn) / m)))
    }
    assert(got.toSeq == Seq(
      ("a", 2L, 3L, r6(3.0 / 7), r6(4.0 / 7), kl(2, 3), js(2, 3)),
      ("b", 2L, 0L, r6(3.0 / 7), r6(1.0 / 7), kl(2, 0), js(2, 0)),
      ("c", 0L, 1L, r6(1.0 / 7), r6(2.0 / 7), kl(0, 1), js(0, 1))), s"got ${got.toSeq}")
    // a vanished source contributes a finite negative KL term (smoothing),
    // and JS stays within its ln(2) bound per term
    assert(got.forall { case (_, _, _, _, _, k, j) =>
      !k.isNaN && !k.isInfinite && j >= 0.0 && j <= math.log(2.0) })
  }

  test("mixtureSample rejects a colliding id column name") {
    val docs = Seq(("s", 1L)).toDF("source", "tk")
    val e = intercept[IllegalArgumentException] {
      Curation.mixtureSample(docs, $"source", "source", $"tk", Seq("s" -> 1L))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("dsirWeights equals the two-lmScore composition, and ranks target-like docs higher") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "zz", "zork blee zork blee qux"),
      (4L, "zz", "the cat sat zork blee")).toDF("doc_id", "lang", "text")
    val target = docs.filter($"lang" === "en")
    val fused = Curation.dsirWeights(docs, target, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // composition oracle: two independent lmScore passes
    val t = TextAnalysis.lmScore(docs, target, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val b = TextAnalysis.lmScore(docs, docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fused.keySet === t.keySet)
    fused.foreach { case (id, (n, xt, xb, w)) =>
      assert((n, xt) === t(id), s"target xent mismatch for doc $id")
      assert(xb === b(id), s"background xent mismatch for doc $id")
      assert(w === BigDecimal.valueOf(xb - xt)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the pure-English doc must outrank the pure-gibberish doc
    assert(fused(1L)._4 > fused(3L)._4)
  }

  test("prioritySample: deterministic, weight-respecting, excludes non-positive weights") {
    val docs = (1L to 200L).map(i => (i, if (i == 7L) 1000000L else 10L)) ++
      Seq((201L, 0L), (202L, -5L))
    val df = docs.toDF("doc_id", "w")
    val s1 = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val s2 = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "s")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(s1.toSeq === s2.toSeq, "same seed must reproduce the same sample")
    assert(s1.length == 20)
    // the 100000x-heavier doc is a near-certain member (P(miss) ~ 1e-7)
    assert(s1.exists(_._1 == 7L), "the dominant-weight doc must be sampled")
    assert(!s1.exists(t => t._1 == 201L || t._1 == 202L), "w <= 0 never samples")
    // a different seed permutes the uniforms -> (astronomically likely) a
    // different sample set among the 199 light docs
    val s3 = Curation.prioritySample(df, "doc_id", col("w"), k = 20, seed = "t")
      .collect().map(_.getLong(0)).toSet
    assert(s3 != s1.map(_._1).toSet, "seed must drive the sample")
  }

  test("pplBuckets: rank-based terciles per group, head = lowest perplexity") {
    // one group of 7 (sizes 3/2/2) and one group of 2 (sizes 1/1/0 -> no
    // tail) — doc 10 repeats the most common bigram so it must land in head
    val docs = (Seq(
      (10L, "g1", "a b a b a b a b"),
      (11L, "g1", "a b c d"), (12L, "g1", "b a d c"), (13L, "g1", "c c c d"),
      (14L, "g1", "d a b c"), (15L, "g1", "e f g h"), (16L, "g1", "h g f e"),
      (20L, "g2", "a b a b"), (21L, "g2", "q r s t"))).toDF("doc_id", "lang", "text")
    val out = Curation.pplBuckets(docs, docs, "doc_id", col("text"), $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(4), r.getString(5)))
    val g1 = out.filter(_._2 == "g1")
    assert(g1.count(_._4 == "head") == 3 && g1.count(_._4 == "middle") == 2 &&
      g1.count(_._4 == "tail") == 2, g1.mkString(", "))
    // bucket order must follow ppl order within the group
    val byPpl = g1.sortBy(t => (t._3, t._1)).map(_._4)
    assert(byPpl.toSeq == Seq("head", "head", "head", "middle", "middle", "tail", "tail"))
    assert(g1.filter(_._1 == 10L).head._4 == "head")
    val g2 = out.filter(_._2 == "g2").sortBy(_._3).map(_._4)
    assert(g2.toSeq == Seq("head", "middle"), "a 2-doc group has no tail")
  }

  test("pplBuckets approx: value-consistent buckets, near-third sizes, ties sink to head") {
    // 30 docs with distinct perplexities in one group: approx buckets must
    // be value-consistent (max ppl of head <= min ppl of middle <= ...) and
    // each within 2 of n/3 at high accuracy
    val docs = (1L to 30L).map { i =>
      val toks = (1 to (i.toInt % 7 + 2)).map(j => s"t${(i + j) % 13}")
      (i, "g1", toks.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = Curation.pplBuckets(docs, docs, "doc_id", col("text"), $"lang",
      approx = true).collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getString(5)))
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (b <- Seq("head", "middle", "tail"))
      assert(byBucket.contains(b) && math.abs(byBucket(b).size - 10) <= 2,
        s"bucket $b size ${byBucket.get(b).map(_.size)} not near a third: $byBucket")
    assert(byBucket("head").max <= byBucket("middle").min,
      "head perplexities must not exceed middle's")
    assert(byBucket("middle").max <= byBucket("tail").min,
      "middle perplexities must not exceed tail's")
    // all-tied group: every doc's ppl equals the tercile boundary -> head
    val tied = (1L to 9L).map(i => (i, "t", "a b a b")).toDF("doc_id", "lang", "text")
    val tb = Curation.pplBuckets(tied, tied, "doc_id", col("text"), $"lang",
      approx = true).collect().map(_.getString(5))
    assert(tb.forall(_ == "head"), s"ties at the boundary sink to head, got ${tb.toSeq}")
  }

  test("scoreCalibrate: hand-checked percent_rank and z; single-row source is 0/0") {
    val docs = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "a", 5.0),
      (5L, "b", 9.0)).toDF("doc_id", "source", "score").repartition(4)
    val out = Curation.scoreCalibrate(docs, col("source"), "doc_id", col("score"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    // source a: mean 2.5, var_samp 3 -> z = (x - 2.5)/sqrt(3); ties share pct
    assert(out == Seq(
      (1L, 0.0, -0.866025), (2L, 0.333333, -0.288675), (3L, 0.333333, -0.288675),
      (4L, 1.0, 1.443376), (5L, 0.0, 0.0)),
      s"calibration mismatch: $out")
    // deterministic under repartition (ties share ranks; decimal moments)
    val again = Curation.scoreCalibrate(
        docs.repartition(11), col("source"), "doc_id", col("score"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    assert(again == out)
  }

  test("curriculumOrder: quantile bands, dense order, seed-keyed reshuffle") {
    val docs = (1L to 100L).map(i => (i, (i * 37 % 100).toDouble))
      .toDF("doc_id", "s").repartition(7)
    val out = Curation.curriculumOrder(docs, "doc_id", col("s"), bands = 4, seed = "e0")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2),
        r.getString(3), r.getLong(4))).toSeq
    // dense, total order 0..n-1
    assert(out.map(_._5).sorted == (0L until 100L), "order_idx dense 0..n-1")
    // bands partition the corpus into quantile quarters, ascending by score
    val byBand = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBand.keySet == Set(0, 1, 2, 3))
    assert((0 to 2).forall(b => byBand(b).max < byBand(b + 1).min),
      "score >= cut opens the next band, so bands are disjoint ascending ranges")
    assert(byBand.values.forall(v => v.size >= 20 && v.size <= 30),
      s"roughly equal quarters: ${byBand.view.mapValues(_.size).toMap}")
    // order is (band, md5 key): within the schedule, bands appear in blocks
    val bandSeq = out.sortBy(_._5).map(_._3)
    assert(bandSeq == bandSeq.sorted, "schedule walks bands ascending")
    // same seed -> identical schedule regardless of partitioning
    val again = Curation.curriculumOrder(docs.repartition(3), "doc_id",
      col("s"), 4, "e0").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(out.map(t => (t._1, t._5)).toMap == again, "partitioning-invariant")
    // a new seed reshuffles within bands but keeps band membership
    val ep1 = Curation.curriculumOrder(docs, "doc_id", col("s"), 4, "e1")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(4))).toSeq
    assert(ep1.map(t => (t._1, t._2)).toMap == out.map(t => (t._1, t._3)).toMap,
      "bands are seed-independent")
    assert(ep1.map(t => (t._1, t._3)).toMap != out.map(t => (t._1, t._5)).toMap,
      "epoch seed changes the within-band order")
    // bands = 1 degenerates to a pure md5 shuffle
    val one = Curation.curriculumOrder(docs, "doc_id", col("s"), 1, "e0")
      .collect().map(r => r.getInt(2)).toSet
    assert(one == Set(0))
    intercept[IllegalArgumentException](
      Curation.curriculumOrder(docs, "doc_id", col("s"), 0, "e0"))
    intercept[IllegalArgumentException](
      Curation.curriculumOrder(docs, "doc_id", col("s"), 4, ""))
  }

  /** UniMax's own greedy loop (ascending capacity, each source takes
    * min(cap, remaining/remaining_sources)) — the paper-literal
    * reference the waterfill closed form must equal. */
  private def uniMaxGreedy(caps: Seq[(String, Long)], budget: Long): Map[String, Double] = {
    val sorted = caps.sortBy { case (s, c) => (c, s) }
    var remaining = budget.toDouble
    var k = sorted.size
    val out = scala.collection.mutable.Map[String, Double]()
    for ((s, cap) <- sorted) {
      val share = remaining / k
      val take = math.min(cap.toDouble, share)
      out(s) = take
      remaining -= take
      k -= 1
    }
    out.toMap
  }

  test("uniMaxPlan: hand fixture — small source caps out, rest share one level") {
    // tokens: a=10, b=40, c=100; epochs cap 2 -> caps 20/80/200; budget 150
    // a capped at 20; level = (150-20)/2 = 65 <= 80,200 -> b,c at 65
    val docs = Seq(
      ("a", 10L), ("b", 25L), ("b", 15L), ("c", 100L)
    ).toDF("src", "toks")
    val out = Curation.uniMaxPlan(docs, col("src"), col("toks"), 150L, 2)
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(out.toSeq === Seq(
      ("a", 1L, 10L, 20L, true, 20.0, 2.0, 0L),
      ("b", 2L, 40L, 80L, false, 65.0, 1.625, 0L),
      ("c", 1L, 100L, 200L, false, 65.0, 0.65, 0L)))
  }

  test("uniMaxPlan: all sources capped reports the unallocatable budget_left") {
    val docs = Seq(("a", 10L), ("b", 20L)).toDF("src", "toks")
    val out = Curation.uniMaxPlan(docs, col("src"), col("toks"), 1000L, 3)
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getBoolean(4), r.getDouble(5), r.getLong(7)))
    // caps 30 + 60 = 90 < 1000: everything capped, 910 left on the table
    assert(out.toSeq === Seq(("a", true, 30.0, 910L), ("b", true, 60.0, 910L)))
  }

  test("uniMaxPlan: budget under every cap splits uniformly, nothing capped") {
    val docs = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("src", "toks")
    val out = Curation.uniMaxPlan(docs, col("src"), col("toks"), 90L, 1)
      .collect().map(r => (r.getString(0), r.getBoolean(4), r.getDouble(5))).toSeq
    assert(out.forall(t => !t._2 && t._3 === 30.0))
  }

  test("differential: uniMaxPlan equals the paper's greedy loop on random corpora") {
    val rnd = new scala.util.Random(150)
    for (trial <- 1 to 8) {
      val nSrc = 2 + rnd.nextInt(8)
      val rows = (0 until nSrc).flatMap { i =>
        val nDocs = 1 + rnd.nextInt(4)
        Seq.fill(nDocs)((s"s$i", rnd.nextInt(200).toLong))
      }
      val epochs = 1 + rnd.nextInt(4)
      val budget = 1L + rnd.nextInt(3000)
      val caps = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sum * epochs).toSeq.map(t => (t._1, t._2))
      val want = uniMaxGreedy(caps, budget)
      val got = Curation.uniMaxPlan(rows.toDF("src", "toks"), col("src"),
        col("toks"), budget, epochs).collect()
        .map(r => r.getString(0) -> r.getDouble(5)).toMap
      want.foreach { case (s, alloc) =>
        assert(math.abs(got(s) - alloc) < 1e-5,
          s"trial $trial source $s: greedy $alloc vs waterfill ${got(s)} " +
            s"(caps=$caps budget=$budget)")
      }
      // allocations exhaust min(budget, total capacity)
      val totalCap = caps.map(_._2).sum
      assert(math.abs(got.values.sum - math.min(budget.toDouble, totalCap.toDouble)) < 1e-4)
    }
  }

  // ---- X151 trained quality classifier -----------------------------------

  /** The engine's 28-bit md5 bucket hash, in-memory. */
  private def md5Bucket(t: String, dims: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(7)
    (java.lang.Long.parseLong(hex, 16) % dims).toInt
  }

  private def halfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact in-memory replay of qualityClassifier's training: same hash,
    * same left-assoc logit chain, same 1e-6 residual quantization, same
    * driver update op order — outputs must match BIT-FOR-BIT. */
  private def lrReference(docs: Seq[(Long, String, Int)], dims: Int,
      iters: Int, lr: Double): Map[Long, Double] = {
    val masks = docs.map { case (id, text, y) =>
      val m = text.trim.toLowerCase.split(" +").filter(_.nonEmpty)
        .foldLeft(0L)((acc, t) => acc | (1L << md5Bucket(t, dims)))
      (id, m, y)
    }
    val w = Array.fill(dims)(0.0); var b = 0.0
    def p(mask: Long): Double = {
      var z = b
      var j = 0
      while (j < dims) { z = z + (if (((mask >> j) & 1L) == 1L) w(j) else 0.0); j += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
    for (_ <- 1 to iters) {
      val g = Array.fill(dims)(0L); var gb = 0L
      masks.foreach { case (_, m, y) =>
        val ri = BigDecimal((p(m) - y) * 1000000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        var j = 0
        while (j < dims) { if (((m >> j) & 1L) == 1L) g(j) += ri; j += 1 }
        gb += ri
      }
      val n = masks.size.toDouble
      var j = 0
      while (j < dims) { w(j) = w(j) - lr * (g(j).toDouble / n / 1000000.0); j += 1 }
      b = b - lr * (gb.toDouble / n / 1000000.0)
    }
    masks.map { case (id, m, _) => id -> halfUp(p(m), 6) }.toMap
  }

  test("featureMask: known tokens set their md5 buckets; order/duplication-free") {
    val dims = 16
    val out = Seq((1L, "hello world hello"), (2L, "world hello"), (3L, "  "))
      .toDF("id", "text")
      .select(col("id"), Curation.featureMask(col("text"), dims).as("m"))
      .orderBy(col("id")).as[(Long, Long)].collect()
    val want = (1L << md5Bucket("hello", dims)) | (1L << md5Bucket("world", dims))
    assert(out(0)._2 === want)
    assert(out(1)._2 === want, "mask is a set: order and multiplicity free")
    // whitespace-only text tokenizes to [""] — the empty token's bucket
    assert(out(2)._2 === (1L << md5Bucket("", dims)))
    intercept[IllegalArgumentException](Curation.featureMask(col("text"), 0))
    intercept[IllegalArgumentException](Curation.featureMask(col("text"), 61))
  }

  test("qualityClassifier: learns a separable corpus; pinned outputs partition-invariant") {
    val rnd = new scala.util.Random(151)
    val noise = Vector("lorem", "ipsum", "dolor", "sit", "amet", "elit")
    val docs = (1L to 80L).map { id =>
      val pos = id % 4 == 0
      val marker = if (pos) "curated encyclopedia" else "spam click"
      val body = Seq.fill(4)(noise(rnd.nextInt(noise.size))).mkString(" ")
      (id, s"$marker $body", if (pos) 1 else 0)
    }
    val df = docs.toDF("doc_id", "text", "y")
    val out = Curation.qualityClassifier(df, "doc_id", col("text"),
      col("y") === 1, dims = 16, iters = 5, lr = 1.0)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
    graft.util.Pins.release(out)
    val posMean = rows.filter(_._2 == 1).map(_._3).sum / rows.count(_._2 == 1)
    val negMean = rows.filter(_._2 == 0).map(_._3).sum / rows.count(_._2 == 0)
    assert(posMean > negMean + 0.1,
      s"training separates the marked positives: pos=$posMean neg=$negMean")
    // partitioning cannot change anything: integer gradient sums are
    // order-independent, so weights — and every prob — are identical
    val out2 = Curation.qualityClassifier(df.repartition(7), "doc_id",
      col("text"), col("y") === 1, dims = 16, iters = 5, lr = 1.0)
    val rows2 = out2.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    graft.util.Pins.release(out2)
    rows.foreach { case (id, _, prob, _) =>
      assert(rows2(id) === prob, s"doc $id prob differs across partitionings") }
  }

  test("differential: qualityClassifier training replays bit-for-bit in memory") {
    val rnd = new scala.util.Random(1510)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1L to 60L).map { id =>
      val text = Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      (id, text, rnd.nextInt(2))
    }
    val want = lrReference(docs, dims = 8, iters = 3, lr = 0.5)
    val out = Curation.qualityClassifier(docs.toDF("doc_id", "text", "y"),
      "doc_id", col("text"), col("y") === 1, dims = 8, iters = 3, lr = 0.5)
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.util.Pins.release(out)
    docs.foreach { case (id, _, _) =>
      assert(got(id) === want(id), s"doc $id: engine ${got(id)} vs reference ${want(id)}") }
  }

  test("calibrationCurve: hand-computed bins, gaps, and ECE terms") {
    // bin width 0.5 (bins=2): bin0 = {0.2 y1, 0.4 y0}, bin1 = {0.6 y1, 1.0 y1}
    val scored = Seq((0.2, 1), (0.4, 0), (0.6, 1), (1.0, 1))
      .toDF("prob", "label")
    val out = Curation.calibrationCurve(scored, col("prob"), col("label"), 2)
      .orderBy(col("bin")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      // bin0: conf 0.3, acc 0.5, gap 0.2, ece (2/4)*0.2 = 0.1
      (0, 2L, 0.3, 0.5, 0.2, 0.1),
      // bin1: conf 0.8, acc 1.0, gap 0.2, ece 0.1   (prob=1.0 clamps into top bin)
      (1, 2L, 0.8, 1.0, 0.2, 0.1)))
    // ECE = sum of terms
    assert(math.abs(out.map(_._6).sum - 0.2) < 1e-9)
    intercept[IllegalArgumentException](
      Curation.calibrationCurve(scored, col("prob"), col("label"), 0))
  }

  test("calibrationCurve: a perfectly calibrated score has zero gap everywhere") {
    // each prob value appears with exactly that fraction of positives
    val rows = Seq.fill(10)((0.3, 0)).zipWithIndex.map { case ((p, _), i) =>
      (p, if (i < 3) 1 else 0) } ++
      Seq.tabulate(10)(i => (0.7, if (i < 7) 1 else 0))
    val out = Curation.calibrationCurve(rows.toDF("prob", "label"),
      col("prob"), col("label"), 10).collect()
      .map(r => (r.getInt(0), r.getDouble(4), r.getDouble(5)))
    assert(out.length === 2)
    assert(out.forall(t => t._2 === 0.0 && t._3 === 0.0),
      s"zero gap and ECE: ${out.toSeq}")
  }

  test("epochSchedule: full passes exact, fractional pass ~rate, epochs reshuffle") {
    val docs = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b"))
      .toDF("doc_id", "src")
    val out = Curation.epochSchedule(docs, "doc_id", col("src"),
      Seq("a" -> 2.0, "b" -> 1.5), seed = "s0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getLong(4)))
    // dense global order
    assert(out.map(_._5).sorted.toSeq == (0L until out.length))
    // source a: exactly 2 full passes of its 100 docs
    val a = out.filter(_._2 == "a")
    assert(a.count(_._3 == 1) == 100 && a.count(_._3 == 2) == 100)
    // source b: epoch 1 full, epoch 2 a deterministic ~half sample
    val b = out.filter(_._2 == "b")
    assert(b.count(_._3 == 1) == 100)
    val frac = b.count(_._3 == 2)
    assert(frac > 30 && frac < 70, s"~50 of 100 expected, got $frac")
    // epochs interleave nothing: schedule walks epochs in blocks
    val eSeq = out.sortBy(_._5).map(_._3)
    assert(eSeq.sameElements(eSeq.sorted), "epoch-major order")
    // same seed reproduces; a new seed reshuffles within epochs
    val again = Curation.epochSchedule(docs.repartition(7), "doc_id", col("src"),
      Seq("a" -> 2.0, "b" -> 1.5), "s0").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(4)).toMap
    assert(out.map(t => (t._1, t._3) -> t._5).toMap == again,
      "partitioning/run invariant")
    val reseeded = Curation.epochSchedule(docs, "doc_id", col("src"),
      Seq("a" -> 2.0, "b" -> 1.5), "s1").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(4)).toMap
    assert(reseeded != out.map(t => (t._1, t._3) -> t._5).toMap,
      "new seed must reshuffle")
  }

  test("epochSchedule: unplanned sources drop; bad plans rejected") {
    val docs = Seq((1L, "a"), (2L, "zzz")).toDF("doc_id", "src")
    val out = Curation.epochSchedule(docs, "doc_id", col("src"),
      Seq("a" -> 1.0), "s")
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalArgumentException](
      Curation.epochSchedule(docs, "doc_id", col("src"), Nil, "s"))
    intercept[IllegalArgumentException](
      Curation.epochSchedule(docs, "doc_id", col("src"), Seq("a" -> 0.0), "s"))
    intercept[IllegalArgumentException](
      Curation.epochSchedule(docs, "doc_id", col("src"), Seq("a" -> 51.0), "s"))
    intercept[IllegalArgumentException](
      Curation.epochSchedule(docs, "doc_id", col("src"),
        Seq("a" -> 1.0, "a" -> 2.0), "s"))
    intercept[IllegalArgumentException](
      Curation.epochSchedule(docs, "doc_id", col("src"), Seq("a" -> 1.0), ""))
  }

  test("qualityClassifier rejects bad hyperparameters") {
    val df = Seq((1L, "x", 1)).toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException](
      Curation.qualityClassifier(df, "doc_id", col("text"), col("y") === 1, 16, 0, 0.5))
    intercept[IllegalArgumentException](
      Curation.qualityClassifier(df, "doc_id", col("text"), col("y") === 1, 16, 3, 0.0))
    intercept[IllegalArgumentException](
      Curation.qualityClassifier(df, "doc_id", col("text"), col("y") === 1, 64, 3, 0.5))
  }

  test("uniMaxPlan: zero-token source allocates zero with null epochs; bad args rejected") {
    val docs = Seq(("a", 0L), ("b", 50L)).toDF("src", "toks")
    val out = Curation.uniMaxPlan(docs, col("src"), col("toks"), 100L, 2)
      .orderBy(col("source")).collect()
    assert(out(0).getDouble(5) === 0.0 && out(0).isNullAt(6))
    intercept[IllegalArgumentException](
      Curation.uniMaxPlan(docs, col("src"), col("toks"), 0L, 2))
    intercept[IllegalArgumentException](
      Curation.uniMaxPlan(docs, col("src"), col("toks"), 100L, 0))
  }

  test("samplerAgg: deterministic top-n cut; over-ask returns everything (X284)") {
    val df = Seq(("a", 5), ("b", 9), ("c", 7), ("d", 1)).toDF("k", "v")
    val got = Curation.samplerAgg(df, 2, $"v".desc, $"k".asc)
      .as[(String, Int)].collect().toSeq
    assert(got === Seq(("b", 9), ("c", 7)), "top-2 under the stated order")
    assert(Curation.samplerAgg(df, 10, $"v".desc, $"k".asc).count() === 4,
      "a budget above the corpus keeps every row")
    intercept[IllegalArgumentException](Curation.samplerAgg(df, 0, $"v"))
    intercept[IllegalArgumentException](Curation.samplerAgg(df, 2))
  }

  test("diversifiedSampler: per-key cap cuts BEFORE the heap — a dominant key cannot fill the budget (X284)") {
    // key 'a' holds the 4 best rows; plain sampler would take 3 of them
    val df = Seq(("a", 10), ("a", 9), ("a", 8), ("a", 7),
      ("b", 6), ("c", 5)).toDF("k", "v")
    val plain = Curation.samplerAgg(df, 3, $"v".desc, $"k".asc)
      .as[(String, Int)].collect().toSeq
    assert(plain === Seq(("a", 10), ("a", 9), ("a", 8)))
    val div = Curation.diversifiedSampler(df, $"k", maxDocsPerValue = 1,
        shardSize = 3, $"v".desc, $"k".asc)
      .as[(String, Int)].collect().toSeq
    assert(div === Seq(("a", 10), ("b", 6), ("c", 5)),
      "each key contributes its single best row, heap over the survivors")
    // cap 2: 'a' gets two slots, then the best of the rest
    val div2 = Curation.diversifiedSampler(df, $"k", maxDocsPerValue = 2,
        shardSize = 3, $"v".desc, $"k".asc)
      .as[(String, Int)].collect().toSeq
    assert(div2 === Seq(("a", 10), ("a", 9), ("b", 6)))
    // the helper column never leaks into the output schema
    assert(!Curation.diversifiedSampler(df, $"k", 1, 3, $"v".desc)
      .columns.contains("rn"))
    intercept[IllegalArgumentException](
      Curation.diversifiedSampler(df, $"k", 0, 3, $"v"))
    intercept[IllegalArgumentException](
      Curation.diversifiedSampler(df, $"k", 1, 0, $"v"))
    intercept[IllegalArgumentException](
      Curation.diversifiedSampler(df, $"k", 1, 3))
  }
}
