package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "The Quick  Brown fox jumps over the lazy dog near the river bank"), // exact dup of 1 mod case/ws
    (3L, "the quick brown fox jumps over the lazy cat near the river bank"),  // near dup of 1
    (4L, "completely different content about distributed query engines and parquet files"),
    (5L, "another unrelated document discussing minhash banding and lsh buckets")
  ).toDF("doc_id", "text")

  test("exact-dup groups: case/whitespace-insensitive fingerprint groups 1 and 2") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", $"text").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("dup_count") == 2)
    assert(groups(0).getAs[Long]("canonical_id") == 1L)
  }

  test("exactDedup keeps the min-id doc per fingerprint") {
    val kept = Dedup.exactDedup(docs, "doc_id", $"text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("staged withMinhashSignature equals the single-expression form") {
    val staged = Dedup.withMinhashSignature(docs, $"text", 3, 4)
      .select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val inline = docs.select($"doc_id", Dedup.minhashSignature($"text", 3, 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(staged == inline)
    assert(staged(1L) == staged(2L), "identical normalized text -> identical signature")
  }

  test("minhash LSH candidates find the exact pair; jaccard verifies") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", $"text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "exact dup must share every band")

    val verified = Dedup.jaccardVerify(pairs, docs, "doc_id", $"text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(verified((1L, 2L)) == 1.0)
    verified.get((1L, 3L)).foreach(j => assert(j > 0.3 && j < 1.0))
  }

  test("leakageSafeSplit: near-dup clusters never straddle a split boundary") {
    val out = Dedup.leakageSafeSplit(docs, "doc_id", $"text",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25), salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 5, "every doc assigned")
    // docs 1, 2, 3 are one near-dup component -> one group, ONE split
    val g123 = out.filter(t => Set(1L, 2L, 3L)(t._1))
    assert(g123.map(_._2).distinct.length == 1, s"group ids differ: ${g123.toSeq}")
    assert(g123.map(_._3).distinct.length == 1, s"cluster straddles splits: ${g123.toSeq}")
    assert(g123.head._2 == 1L, "group labeled by the component minimum")
    // singletons group as themselves
    assert(out.find(_._1 == 4L).get._2 == 4L)
  }

  test("dedupProvenance: exact rule first, near components over survivors, each doc once") {
    val prov = Dedup.dedupProvenance(docs, "doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 2 is the exact dup of doc 1 (case/ws); doc 3 is the near dup
    assert(prov.contains((2L, 1L, "exact")), s"got ${prov.toSeq}")
    assert(prov.contains((3L, 1L, "near")), s"got ${prov.toSeq}")
    // exact-removed docs never reappear in the near phase; one row per
    // removed doc; unrelated docs never removed
    assert(prov.count(_._1 == 2L) == 1 && prov.map(_._1).distinct.length == prov.length)
    assert(!prov.exists(p => p._1 == 4L || p._1 == 5L))
    assert(prov.forall(p => p._2 < p._1), "kept id is always the component minimum")
  }

  test("similarityHistogram: exact pair in the top bucket, cumulative counts consistent") {
    val h = Dedup.similarityHistogram(docs, "doc_id", $"text")
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // docs 1/2 are exact dups (jaccard 1.0 -> bucket 9, never bucket 10)
    val top = h.last
    assert(top._1 == 9 && top._2 == 0.9 && top._3 >= 1, s"top bucket: $top")
    assert(h.forall(_._1 <= 9), "jaccard 1.0 must clamp into bucket 9")
    // cumulative = suffix sums of n_pairs, and the lowest row covers all
    val total = h.map(_._3).sum
    h.foreach { case (b, _, _, cum) =>
      assert(cum == h.filter(_._1 >= b).map(_._3).sum, s"cumulative broken at $b") }
    assert(h.head._4 == total)
  }

  test("dedupGroups: connected components collapse transitive chains to the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L)).toDF("id1", "id2")
    val groups = Dedup.dedupGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) == 1L && groups(2L) == 1L && groups(3L) == 1L && groups(7L) == 1L,
      s"chain 1-2-3-7 is one component: $groups")
    assert(groups(10L) == 10L && groups(11L) == 10L)

    val docs = Seq(1L, 2L, 3L, 7L, 10L, 11L, 99L).toDF("doc_id")
    val kept = Dedup.keepCanonical(docs, "doc_id", Dedup.dedupGroups(pairs))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L), "canonical per cluster + untouched singletons")
  }

  test("incrementalDedup: bloom pre-filter + exact verify equals a plain anti-join") {
    val history = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "some historical document that was already ingested last month")
    ).toDF("doc_id", "text")
    // new batch: 2 exact dups of history (one differing only in case/ws),
    // 2 genuinely new docs
    val fresh = Seq(
      (1L, "THE QUICK brown fox jumps over the lazy dog near the river bank"),
      (2L, "some historical document that was already ingested last month"),
      (3L, "a brand new document never seen before"),
      (4L, "another novel piece of content entirely")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(fresh, history, "doc_id", $"text", $"text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L), s"dups of history dropped, novel docs kept: $kept")
    // exactness under a deliberately undersized filter (high fpp): false
    // positives must be cleared by the verify join
    val keptTiny = Dedup.incrementalDedup(fresh, history, "doc_id", $"text", $"text",
      expectedHistoryItems = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTiny === Set(3L, 4L), "result is exact regardless of filter sizing")
    // bootstrap ingest: an EMPTY history means nothing is a dup — the
    // null bloom aggregate must not eat the batch
    val keptBootstrap = Dedup.incrementalDedup(
      fresh, history.filter($"doc_id" < 0), "doc_id", $"text", $"text")
      .select("doc_id").as[Long].collect().toSet
    assert(keptBootstrap === Set(1L, 2L, 3L, 4L),
      "empty history keeps the entire first batch")
  }

  test("differential: dedupGroups equals brute-force connected components on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // reference: union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(id => find(id.toInt))
      val expected = byRoot.values.flatMap(c => c.map(_ -> c.min)).toMap

      val got = Dedup.dedupGroups(edges.toDF("id1", "id2"), maxIter = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: edges=$edges")
    }
  }

  test("differential: hashed jaccard agrees with exact-string jaccard on real docs") {
    val sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val pairs = sf.select($"doc_id".as("id1"), ($"doc_id" + 1).as("id2"))
    val exact = Dedup.jaccardVerify(pairs, sf, "doc_id", $"text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val hashed = Dedup.jaccardVerifyHashed(pairs, sf, "doc_id", $"text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.keySet === hashed.keySet)
    // 28-bit hashing may merge colliding shingles; on these set sizes any
    // collision shifts jaccard by well under 0.01
    exact.foreach { case (k, v) =>
      assert(math.abs(v - hashed(k)) < 0.01, s"pair $k: exact $v vs hashed ${hashed(k)}")
    }
  }

  test("end-to-end dedup: candidates -> groups -> canonical set on real dup docs") {
    val groups = Dedup.dedupGroups(Dedup.minhashCandidatePairs(docs, "doc_id", $"text"))
    val kept = Dedup.keepCanonical(docs, "doc_id", groups)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L), "exact dup of doc 1 removed")
    assert(kept.contains(1L), "canonical kept")
  }

  test("staged withSimhash16 equals the single-expression form; near-dups are hamming-close") {
    val staged = Dedup.withSimhash16(docs, $"text")
      .select($"doc_id", $"simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inline = docs.select($"doc_id", Dedup.simhash16($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(staged == inline)
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hd(staged(1L), staged(3L)) < hd(staged(1L), staged(4L)),
      "near-dup closer than unrelated doc")
  }

  test("embedding near-dups via banding: parallel vectors pair, orthogonal do not") {
    val embs = Seq(
      (1L, Seq(1f, 2f, 3f, 4f, 1f, -1f, 2f, -2f)),
      (2L, Seq(1.01f, 2.02f, 3.03f, 4.04f, 1.01f, -1.01f, 2.02f, -2.02f)), // parallel to 1
      (3L, Seq(-1f, 2f, -3f, 4f, -1f, 1f, -2f, 2f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val pairs = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
      bandBits = 4, numBands = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("multi-band recall: a pair differing only in the first band is still a candidate") {
    // identical in dims 5-8 (band 1), different signs in dims 1-4 (band 0)
    val embs = Seq(
      (1L, Seq(1f, 1f, 1f, 1f, 2f, 2f, 2f, 2f)),
      (2L, Seq(-1f, -1f, -1f, -1f, 2f, 2f, 2f, 2f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val single = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
      bandBits = 4, numBands = 1, threshold = 0.0).count()
    val multi = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
      bandBits = 4, numBands = 2, threshold = 0.0).count()
    assert(single == 0, "single-prefix bucketing misses the pair")
    assert(multi == 1, "second band recovers it")
  }

  test("lshBandKeys rejects non-divisible or oversized band configs") {
    for ((h, r) <- Seq((8, 3), (8, 16), (8, 0))) {
      val e = intercept[IllegalArgumentException](Dedup.lshBandKeys(col("sig"), h, r))
      assert(e.getMessage.contains("rowsPerBand"), s"($h,$r): ${e.getMessage}")
    }
  }

  test("contaminationScan flags shared n-grams, self-clean corpus stays clean") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bid", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta appears here"), // contaminated
      (2L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminationScan(corpus, "doc_id", $"text",
      bench, "bid", $"text", shingleN = 3, minOverlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((1L, 100L, 2L)),
      s"doc 1 shares 2 tri-grams ('alpha beta gamma', 'beta gamma delta'): ${hits.toSeq}")
  }

  test("embeddingNearDups rejects band configs wider than the embedding dim") {
    val embs = Seq((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(1f, 2f, 3f, 5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(embs, "vec_id", "embedding", bandBits = 4, numBands = 2)
    }
    assert(e.getMessage.contains("exceeds the embedding dimension"))
  }

  // ---- lineDedup --------------------------------------------------------

  private def lineDedupMap(docs: DataFrame, minDocs: Int = 2, minLen: Int = 5) =
    Dedup.lineDedup(docs, "doc_id", col("text"), minDocs, minLen)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_clean")))).toMap

  test("lineDedup strips a line shared across docs, keeps unique lines in order") {
    val docs = Seq(
      (1L, "unique first line\nshared boilerplate footer\nunique last line"),
      (2L, "another doc body\nshared boilerplate footer"),
      (3L, "third doc alone")
    ).toDF("doc_id", "text")
    val out = lineDedupMap(docs)
    assert(out(1L) === ((3L, 1L, "unique first line\nunique last line")))
    assert(out(2L) === ((2L, 1L, "another doc body")))
    assert(out(3L) === ((1L, 0L, "third doc alone")))
  }

  test("lineDedup: lines below minLen never dedup; same-doc repeats don't count") {
    val docs = Seq(
      // "--" is duplicated across docs but under minLen -> kept everywhere;
      // "repeated inside one doc" occurs twice in doc 1 ONLY -> kept (the
      // census counts distinct docs, not occurrences)
      (1L, "repeated inside one doc\n--\nrepeated inside one doc"),
      (2L, "--\nsomething else entirely")
    ).toDF("doc_id", "text")
    val out = lineDedupMap(docs)
    assert(out(1L) === ((3L, 0L, "repeated inside one doc\n--\nrepeated inside one doc")))
    assert(out(2L) === ((2L, 0L, "--\nsomething else entirely")))
  }

  test("lineDedup: a fully-boilerplate doc collapses to empty text, counts intact") {
    val docs = Seq(
      (1L, "cookie banner text\nsubscribe to newsletter"),
      (2L, "cookie banner text\nsubscribe to newsletter"),
      (3L, "cookie banner text\nreal unique content here")
    ).toDF("doc_id", "text")
    val out = lineDedupMap(docs)
    assert(out(1L) === ((2L, 2L, "")))
    assert(out(2L) === ((2L, 2L, "")))
    assert(out(3L) === ((2L, 1L, "real unique content here")))
  }

  test("lineDedup emits one row per input doc, even for empty text") {
    val docs = Seq((1L, ""), (2L, "only line here"), (3L, "only line here"))
      .toDF("doc_id", "text")
    val out = lineDedupMap(docs)
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((1L, 0L, ""))) // the empty line is under minLen: kept
    assert(out(2L)._2 === 1L)
  }

  // ---- noveltyScore -----------------------------------------------------

  test("noveltyScore: shared shingles cut novelty; disjoint docs score 1.0") {
    val corpus = Seq(
      (1L, "a b c d"),    // shingles {abc, bcd}; abc shared with doc 2
      (2L, "a b c x"),    // shingles {abc, bcx}
      (3L, "p q r s t")   // 3 shingles, all unique corpus-wide
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(corpus, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((3L, 3L, 1.0)))
  }

  test("noveltyScore: exact duplicate docs bottom out at 0; short docs are omitted") {
    val corpus = Seq(
      (1L, "same exact text in both documents"),
      (2L, "same exact text in both documents"),
      (3L, "too few")  // 2 tokens -> no 3-gram shingles -> no row
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScore(corpus, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.0))
  }

  // ---- winnowing --------------------------------------------------------

  test("winnowedSketch: guaranteed detection on long shared runs, short docs drop") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7-token run
    val docs = Seq(
      (1L, s"prefix one two $shared"),
      (2L, s"$shared suffix three four"),
      (3L, "totally different words everywhere in this document"),
      (4L, "only five tokens right here")  // 3 shingles < window=4 -> no rows
    ).toDF("doc_id", "text")
    val sk = Dedup.winnowedSketch(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(!sk.exists(_._1 == 4L), "a doc with fewer shingles than the window has no sketch")
    // winnowing guarantee: a shared run of >= window + shingleN - 1 = 6
    // tokens forces at least one common selected fingerprint
    val s1 = sk.filter(_._1 == 1L).map(_._2).toSet
    val s2 = sk.filter(_._1 == 2L).map(_._2).toSet
    assert((s1 & s2).nonEmpty, "docs sharing a 7-token run must share a fingerprint")
    val pairs = Dedup.winnowedOverlap(docs, "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "no false pair for doc 3")
  }

  test("winnowing guarantee holds on randomized corpora (bulk property)") {
    // every pair (2i, 2i+1) shares a random run of >= 6 tokens
    // (>= window + shingleN - 1), so winnowing MUST pair them; random
    // prefixes/suffixes stress window placement around the run edges
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(50)(i => s"word$i")
    def run(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 20).flatMap { i =>
      val shared = run(6 + rnd.nextInt(5))
      Seq((2L * i, s"${run(rnd.nextInt(8))} $shared".trim),
        (2L * i + 1, s"$shared ${run(rnd.nextInt(8))}".trim))
    }
    val pairs = Dedup.winnowedOverlap(docs.toDF("doc_id", "text"), "doc_id", col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (i <- 0 until 20)
      assert(pairs.contains((2L * i, 2L * i + 1)),
        s"pair ${2 * i}/${2 * i + 1} shares a >=6-token run but was not detected")
  }

  test("winnowedSketch is a strict diet of the full shingle-hash set") {
    val docs = Seq((1L,
      (1 to 40).map(i => s"w$i").mkString(" ") + " w1 w2 w3 tail")).toDF("doc_id", "text")
    val full = Dedup.shingleHashSets(docs, "doc_id", col("text"), 3)
      .select(explode(col("sh"))).as[Long].collect().toSet
    val sk = Dedup.winnowedSketch(docs, "doc_id", col("text")).select("fp")
      .as[Long].collect().toSet
    assert(sk.subsetOf(full), "every fingerprint is one of the doc's shingle hashes")
    assert(sk.size < full.size, "the sketch must be smaller than the full set")
  }

  test("contrastivePairs: up to k positives per component, singletons yield nothing") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), // 5-member component
      (10L, 10L),                                       // singleton
      (20L, 20L), (21L, 20L)                            // pair
    ).toDF("id", "label")
    val out = Dedup.contrastivePairs(clusters, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set(
      (1L, 2L, 1), (1L, 3L, 2), (1L, 4L, 3), // capped at 3, id order; 5 dropped
      (20L, 21L, 1)))
  }

  test("dedupReport: intra-key dup mass and cross-key shared contents per key") {
    val corpus = Seq(
      (1L, "A", "same text one"), (2L, "A", "same  TEXT one"),  // intra-A dup (normalized)
      (3L, "A", "unique to a"),
      (4L, "B", "same text one"),                               // cross-key with A
      (5L, "B", "unique to b"), (6L, "B", "another unique b")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.dedupReport(corpus, col("source"), "doc_id", col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // A: 3 docs over 2 contents -> 1 intra dup; 1 content shared with B
    assert(out("A") === ((3L, 2L, 1L, 1L)))
    // B: 3 docs, all distinct within B; 1 content shared with A
    assert(out("B") === ((3L, 3L, 0L, 1L)))
  }

  // ---- splitLeakage -----------------------------------------------------

  test("differential: splitLeakage equals split+group recomputed in memory") {
    import graft.util.Sampling
    // 40 ids over 8 content groups: every group straddles splits somewhere
    val rows = (1L to 40L).map(id => (id, s"shared content number ${id % 8}"))
    val docs = rows.toDF("doc_id", "text")
    val fracs = Seq("train" -> 0.6, "val" -> 0.2, "test" -> 0.2)
    val split = Sampling.hashSplit(docs.select($"doc_id"), $"doc_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      (id, text) <- rows if split(id) != "train"
      group = rows.filter(_._2 == text).map(_._1)
      trains = group.filter(g => split(g) == "train")
      if trains.nonEmpty
    } yield (id, split(id), trains.min)).toSet
    val got = Dedup.splitLeakage(docs, "doc_id", $"text", fracs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "fixture should actually leak — strengthen it if not")
  }

  // ---- semanticDedup ----------------------------------------------------

  private val semCents = Seq(Array(1f, 0f), Array(0f, 1f))

  private def semMap(rows: Seq[(Long, Seq[Float])], tau: Double) = {
    val embs = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
    Dedup.semanticDedup(embs, "vec_id", "embedding", semCents, tau)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cluster"), r.getAs[Boolean]("is_dup")))).toMap
  }

  test("semanticDedup: near-identical rows in one cluster keep only the lowest id") {
    val out = semMap(Seq(
      10L -> Seq(1f, 0.01f), 11L -> Seq(1f, 0.02f), // cluster 0, cos ~ 1
      20L -> Seq(0.1f, 1f)                          // cluster 1, alone
    ), tau = 0.95)
    assert(out(10L) === ((0, false)))
    assert(out(11L) === ((0, true)))
    assert(out(20L) === ((1, false)))
  }

  test("semanticDedup scores within clusters ONLY: near pair split by the boundary survives") {
    // cosine(a, b) ~ 0.9986 but a lands in cluster 0 and b in cluster 1 —
    // SemDeDup's trade: candidates never cross the coarse partition
    val out = semMap(Seq(1L -> Seq(2f, 1.9f), 2L -> Seq(1.9f, 2f)), tau = 0.9)
    assert(out(1L) === ((0, false)))
    assert(out(2L) === ((1, false)))
  }

  test("semanticDedup: a dup row still witnesses later dups (lower-id rule, not chaining)") {
    // b dup of a; c within tau of b but NOT of a -> c is still a dup
    // (its witness b is itself a dup) — the deterministic lowest-id rule,
    // documented divergence from the paper's exemplar selection
    val a = Seq(1f, 0f); val b = Seq(1f, 0.3f); val c = Seq(1f, 0.62f)
    val out = semMap(Seq(1L -> a, 2L -> b, 3L -> c), tau = 0.955)
    assert(out(1L)._2 === false)
    assert(out(2L)._2 === true, "b within tau of a")
    assert(out(3L)._2 === true, "c within tau of b only, still dropped")
  }

  test("semanticDedup: tau above every pairwise cosine keeps everything") {
    val out = semMap(Seq(1L -> Seq(1f, 0.01f), 2L -> Seq(1f, 0.4f)), tau = 0.9999)
    assert(out.values.forall(!_._2))
  }

  test("snapshotDiff: added/removed/changed/unchanged; reflow is unchanged") {
    val old = Seq(
      (1L, "stable text"), (2L, "will change"), (3L, "will vanish"),
      (4L, "Spaced   Out text")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "stable text"), (2L, "has changed"),
      (4L, "spaced out TEXT"),    // normalization: same fingerprint
      (5L, "brand new")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(old, neu, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("containmentPairs: quoted doc scores c ~ 1 where Jaccard would not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "intro words here alpha beta gamma delta closing words trail"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", col("text"),
        shingleN = 2, maxDf = 10, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    // doc 1 (3 bigram shingles) fully inside doc 2 (9 shingles):
    // n_shared 3 -> c1 = 1.0 (the quote signal), c2 = 3/9 (Jaccard-scale)
    assert(out == Seq((1L, 2L, 3L, 3L, 9L, 1.0, 0.333333)), s"got $out")
  }

  test("containmentPairs: stop-shingle df cut removes boilerplate pairs") {
    val docs = (1L to 4L).map(i =>
      (i, s"common pair uniq${i}a uniq${i}b")).toDF("doc_id", "text")
    // every doc's only shared shingle is "common pair" (df 4)
    val cut = Dedup.containmentPairs(docs, "doc_id", col("text"),
      shingleN = 2, maxDf = 3, minShared = 1)
    assert(cut.count() == 0L, "df-4 shingle must be cut at maxDf 3")
    val kept = Dedup.containmentPairs(docs, "doc_id", col("text"),
        shingleN = 2, maxDf = 4, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(kept == (for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b, 1L)).toSeq,
      s"at maxDf 4 all 6 single-shingle pairs appear: $kept")
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(docs, "doc_id", col("text"), 2, maxDf = 1))
  }

  test("lshPlan: S-curve sanity — monotone in s, more bands = higher recall, exact endpoints") {
    val spark2 = spark
    val plan = Dedup.lshPlan(spark2, 16, Seq(0.1, 0.5, 0.9))
      .collect().map(r => ((r.getInt(1), r.getDouble(3)), r.getDouble(4))).toMap
    // all five factorizations of 16 appear
    assert(plan.keys.map(_._1).toSet == Set(1, 2, 4, 8, 16))
    // hand-check b=1, r=16: p = s^16
    assert(math.abs(plan((1, 0.5)) - math.pow(0.5, 16)) < 1e-6)
    // monotone in s for fixed (b, r)
    for (b <- Seq(1, 2, 4, 8, 16))
      assert(plan((b, 0.1)) <= plan((b, 0.5)) && plan((b, 0.5)) <= plan((b, 0.9)),
        s"p must rise with similarity at bands=$b")
    // at fixed s below 1, more bands (shorter rows) = higher detection
    assert(plan((16, 0.5)) > plan((4, 0.5)) && plan((4, 0.5)) > plan((1, 0.5)),
      "banding trades precision for recall — the S-curve must shift left")
    // endpoint: s=0 never detects, s=1 always does
    val ends = Dedup.lshPlan(spark2, 8, Seq(0.0, 1.0))
      .collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(ends.forall { case (s, p) => if (s == 0.0) p == 0.0 else p == 1.0 })
  }

  test("canonicalByQuality: best score wins, id breaks ties, exact clones degrade to min-id") {
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "label")
    val scores = Seq((1L, 0.4), (2L, 0.9), (3L, 0.9), (7L, 0.5), (9L, 0.5))
      .toDF("id", "score")
    val out = Dedup.canonicalByQuality(groups, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq.sorted
    // cluster 1: docs 2 and 3 tie at 0.9 -> id asc picks 2; doc 1 (0.4) last
    // cluster 7: equal scores (the exact-clone case) -> min-id 7 wins
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 1L), (3L, 1L, 2L),
      (7L, 7L, 1L), (9L, 7L, 2L)), s"got $out")
  }

  test("dupSpans: hand fixture — shared run found whole, unique docs silent") {
    // docs 1 and 2 share the 6-token run "a b c d e f" (every 3-window of
    // it is duplicated); doc 3 is all-unique; doc 4 repeats ITS OWN
    // 3-window (within-doc duplication counts)
    val docs = Seq(
      (1L, "a b c d e f u1 u2 u3"),
      (2L, "v1 v2 a b c d e f"),
      (3L, "w1 w2 w3 w4 w5 w6"),
      (4L, "r s t x1 x2 r s t")).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 0L, 6L, 6L),   // "a b c d e f" at tokens [0, 6)
      (2L, 2L, 8L, 6L),   // same run at tokens [2, 8)
      (4L, 0L, 3L, 3L),   // "r s t" occurs twice within doc 4
      (4L, 5L, 8L, 3L)), s"got $out")
  }

  test("dupSpans: adjacent duplicated windows merge into one maximal span") {
    // the shared run is longer than one window: positions 0..3 of doc 1
    // are all duplicated 4-windows and must merge, not emit 4 spans
    val shared = "p q r s t u v"
    val docs = Seq((1L, s"$shared tail1 tail2"), (2L, s"head1 $shared"))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(out == Seq((1L, 0L, 7L), (2L, 1L, 8L)),
      s"each doc reports ONE maximal 7-token span, got $out")
    // spans never shorter than the window, never past the doc
    val lens = Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 4)
      .collect().map(_.getLong(3))
    assert(lens.forall(_ >= 4))
  }

  test("differential: dupSpans equals the brute-force span merge on random corpora") {
    val rnd = new scala.util.Random(42)
    val L = 4
    // small vocab + random lengths -> plenty of genuine window collisions
    val docs = (1L to 40L).map { i =>
      val n = 5 + rnd.nextInt(25)
      (i, (1 to n).map(_ => s"t${rnd.nextInt(9)}").mkString(" "))
    }
    // brute force: count every L-window occurrence corpus-wide, mark
    // duplicated positions, merge positions whose covered ranges touch
    val windows = docs.flatMap { case (id, text) =>
      text.split(" ").toSeq.sliding(L).filter(_.size == L).zipWithIndex
        .map { case (w, p) => (id, p, w.mkString(" ")) }
    }
    val dupGrams = windows.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = windows.filter(w => dupGrams(w._3))
      .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
        val spans = scala.collection.mutable.ListBuffer[(Long, Long)]()
        ws.map(_._2).sorted.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s0, _) = spans.remove(spans.size - 1); spans += ((s0, p + L))
          } else spans += ((p.toLong, (p + L).toLong))
        }
        spans.map { case (s0, e0) => (id, s0, e0, e0 - s0) }
      }.sorted
    val got = Dedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id",
        col("text"), windowLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == expected, s"got ${got.take(5)}... want ${expected.take(5)}...")
  }

  test("cutSpans: every occurrence removed, clean docs pass through, full dup -> empty") {
    val docs = Seq(
      (1L, "a b c d e f u1 u2 u3"),   // span [0,6) -> survivors u1 u2 u3
      (2L, "v1 v2 a b c d e f"),      // span [2,8) -> survivors v1 v2
      (3L, "w1 w2 w3 w4 w5 w6"),      // unique -> untouched
      (5L, "p q r s p q r s")         // within-doc dup: EVERY occurrence cut
    ).toDF("doc_id", "text")
    val spans = Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 3)
    val out = Dedup.cutSpans(docs, spans, "doc_id", col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, "u1 u2 u3", 9L, 6L),
      (2L, "v1 v2", 8L, 6L),
      (3L, "w1 w2 w3 w4 w5 w6", 6L, 0L),
      (5L, "", 8L, 8L)), s"got $out")
  }

  test("contaminatedSpans: only test-set windows mark train spans; asymmetric") {
    val train = Seq(
      (1L, "a b c d e f u1 u2 u3"),  // leaks "a b c d e f" from test doc 10
      (2L, "w1 w2 w3 w4 w5 w6"),     // clean
      (3L, "r s t x1 r s t")         // self-duplication but NOT in test: clean
    ).toDF("doc_id", "text")
    val test = Seq(
      (10L, "z0 a b c d e f z1")).toDF("doc_id", "text")
    val out = Dedup.contaminatedSpans(train, test, "doc_id", col("text"),
      windowLen = 3).orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 0L, 6L, 6L)),
      s"only the leaked run, found whole; within-train dup is NOT contamination: $out")
    // a train doc that IS a test doc is covered end to end
    val full = Dedup.contaminatedSpans(
      test.select(($"doc_id" + 100).as("doc_id"), $"text"), test,
      "doc_id", col("text"), windowLen = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(full == Seq((110L, 0L, 8L)), s"got $full")
    // and the cut composes: cutSpans removes exactly the leaked tokens
    val spans = Dedup.contaminatedSpans(train, test, "doc_id", col("text"), 3)
    val cleaned = Dedup.cutSpans(train, spans, "doc_id", col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    assert(cleaned == Seq(
      (1L, "u1 u2 u3", 6L), (2L, "w1 w2 w3 w4 w5 w6", 0L),
      (3L, "r s t x1 r s t", 0L)), s"got $cleaned")
  }

  test("dupSpans: nothing shorter than windowLen is detected (the paper's floor)") {
    // 5 shared tokens < windowLen 6 -> no 6-window is shared -> silence
    val docs = Seq((1L, "m n o p q z1 z2"), (2L, "y1 m n o p q y2"))
      .toDF("doc_id", "text")
    assert(Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 6).count() == 0L)
    intercept[IllegalArgumentException](
      Dedup.dupSpans(docs, "doc_id", col("text"), windowLen = 1))
  }

  test("crossSourceDupMatrix: pairwise shared-fingerprint mass, ordered pairs") {
    val docs = Seq(
      (1L, "alpha beta", "a"), (2L, "alpha beta", "b"),   // a<->b shared fp
      (3L, "alpha beta", "b"),                            // b has it twice
      (4L, "gamma", "a"), (5L, "gamma", "c"),             // a<->c shared fp
      (6L, "delta", "c"),                                 // unshared
      (7L, "epsilon", "a"), (8L, "epsilon", "a")          // within-a only: absent
    ).toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDupMatrix(docs, "doc_id", col("text"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("a", "b", 1L, 1L, 2L),   // one shared fp; 1 doc in a, 2 in b
      ("a", "c", 1L, 1L, 1L)), s"got $out")

    // the postings-grain core: three-source fp fans out to all 3 pairs
    val posts = Seq(("f1", "a"), ("f1", "b"), ("f1", "c"), ("f2", "a"))
      .toDF("fp", "src")
    val m = Dedup.crossSourceMatrix(posts, "fp", "src")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)), s"got $m")
  }

  test("lshCalibrate: full grid emitted; exact dup caught by every scheme at every floor") {
    val corpus = docs.union(
      docs.filter($"doc_id" === 1L)
        .select(lit(100L).as("doc_id"), $"text"))
    val out = Dedup.lshCalibrate(corpus, "doc_id", $"text",
      shingleN = 3, numHashes = 8, rowsGrid = Seq(1, 2, 4),
      thresholds = Seq(0.5, 0.9))
    val rows = out.collect()
    graft.util.Pins.release(out)
    assert(rows.length == 6, s"3 schemes x 2 thresholds, got ${rows.length}")
    val byKey = rows.map(r => ((r.getInt(1), r.getDouble(2)),
      (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // docs 1 and 100 are identical: a truth pair at every floor, identical
    // signatures, so every scheme's candidate set contains them
    for (((r, t), (nTruth, nCand, nHit)) <- byKey) {
      assert(nTruth >= 1L, s"exact dup must be a truth pair at rows=$r t=$t")
      assert(nHit >= 1L && nHit <= nCand && nHit <= nTruth,
        s"hit bounds violated at rows=$r t=$t: $nTruth $nCand $nHit")
    }
    // truth counts are scheme-independent
    assert(byKey.keys.groupBy(_._2).forall { case (_, ks) =>
      ks.map(byKey(_)._1).toSet.size == 1 })
  }

  test("differential: lshCalibrate counts equal brute-force candidates + exact jaccard") {
    val out = Dedup.lshCalibrate(docs, "doc_id", $"text",
      shingleN = 3, numHashes = 8, rowsGrid = Seq(2, 4), thresholds = Seq(0.3))
    val rows = out.collect()
    graft.util.Pins.release(out)
    val ids = docs.select($"doc_id").as[Long].collect().sorted
    val allPairs = (for { i <- ids; j <- ids if i < j } yield (i, j))
      .toSeq.toDF("id1", "id2")
    val jacc = Dedup.jaccardVerifyHashed(allPairs, docs, "doc_id", $"text", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (r <- Seq(2, 4)) {
      val cand = Dedup.minhashCandidatePairs(docs, "doc_id", $"text",
        shingleN = 3, numHashes = 8, rowsPerBand = r)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val nTruth = jacc.values.count(_ >= 0.3).toLong
      val nHit = cand.count(p => jacc.getOrElse(p, 0.0) >= 0.3).toLong
      val got = rows.find(x => x.getInt(1) == r).get
      assert(got.getLong(3) == nTruth, s"n_truth mismatch at rows=$r")
      assert(got.getLong(4) == cand.size.toLong, s"n_cand mismatch at rows=$r")
      assert(got.getLong(5) == nHit, s"n_hit mismatch at rows=$r")
    }
  }

  test("lshCalibrate: null precision/recall when a denominator is zero; bad grids rejected") {
    // two docs with zero shared shingles and different signatures: no
    // truth pairs, and (at rows=8) no candidates either
    val disjoint = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Dedup.lshCalibrate(disjoint, "doc_id", $"text",
      shingleN = 3, numHashes = 8, rowsGrid = Seq(8), thresholds = Seq(0.5))
    val r = out.collect()(0)
    graft.util.Pins.release(out)
    assert(r.getLong(3) == 0L && r.isNullAt(7), "no truth pairs -> recall NULL")
    if (r.getLong(4) == 0L) assert(r.isNullAt(6), "no candidates -> precision NULL")
    intercept[IllegalArgumentException] {
      Dedup.lshCalibrate(docs, "doc_id", $"text", 3, 8, Seq(3), Seq(0.5))
    }
    intercept[IllegalArgumentException] {
      Dedup.lshCalibrate(docs, "doc_id", $"text", 3, 8, Seq(2), Seq(0.0))
    }
  }
}
