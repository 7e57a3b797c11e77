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
}
