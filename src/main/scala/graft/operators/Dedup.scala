package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - embedding cosine: near-dup over vectors, bucketed by sign-bit prefix.
  *
  * Hashes are md5-derived (cross-engine deterministic) rather than JVM
  * murmur, so every step is DuckDB-oracle-verifiable.
  */
object Dedup {
  import TextAnalysis.{shingles, tokens}

  /** Exact-dup groups: fingerprint -> (count, canonical doc = min id). */
  def exactDupGroups(docs: DataFrame, idCol: String, text: Column): DataFrame =
    docs
      .groupBy(TextAnalysis.fingerprint(text).as("fp"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("canonical_id"))
      .filter(col("dup_count") > 1)

  /** Exact dedup: keep one doc (min id) per fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(text)).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: for each seed, min over shingles of
    * `substr(md5(seed || ':' || shingle), 1, 16)`. A lexicographic min of
    * md5 hex strings is a perfectly good hash family and is reproducible
    * in any engine with md5. Empty shingle sets get a sentinel. */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column = {
    val sh = shingles(text, shingleN)
    val mins = (0 until numHashes).map { seed =>
      coalesce(
        array_min(transform(sh, s => substring(md5(concat(lit(s"$seed:"), s)), 1, 16))),
        lit("~empty"))
    }
    array(mins: _*)
  }

  /** LSH band keys: signature split into bands of `rowsPerBand` hashes;
    * band key = band index + md5 of the concatenated band slice. Docs
    * sharing ANY band key are near-dup candidates. */
  def lshBandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1))
      concat(lit(s"$b:"), md5(concat_ws("|", slice: _*)))
    }
    array(bands: _*)
  }

  /** Candidate near-dup pairs via MinHash LSH: explode band keys, self-join
    * within buckets (id1 < id2). The join key is the band hash — compact,
    * uniformly distributed, skew-resistant. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sig = docs.select(col(idCol).as("doc_id"),
      minhashSignature(text, shingleN, numHashes).as("sig"))
    val banded = sig.select(col("doc_id"),
      explode(lshBandKeys(col("sig"), numHashes, rowsPerBand)).as("band"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (columns id1, id2): |A ∩ B| / |A ∪ B| over distinct shingles. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      array_distinct(shingles(text, shingleN)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("doc_id", "id1").withColumnRenamed("sh", "sh1"), Seq("id1"))
      .join(sh.withColumnRenamed("doc_id", "id2").withColumnRenamed("sh", "sh2"), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast(DoubleType))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))).cast(DoubleType))
      .withColumn("jaccard", round(when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")), 6))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash per doc from md5-derived token hashes (first 16 hex
    * chars of md5 -> long). One long per doc; near-dups have small hamming
    * distance. */
  def simhash64(text: Column): Column = {
    val hashes = transform(tokens(text),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast(LongType))
    VectorFunctions.simHash64(hashes)
  }

  /** Cross-engine-checkable 16-bit simhash: bit b votes on whether hex char
    * b of md5(token) is >= '8'. Same structure as [[simhash64]], small
    * enough to express in portable SQL for the oracle. */
  def simhash16(text: Column): Column = {
    val toks = tokens(text)
    val bits = (0 until 16).map { b =>
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc + when(substring(md5(t), b + 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-dup pairs: bucket by the sign-bit prefix of the vector
    * (vectors within cosine-near-dup distance almost always share the
    * prefix), then exact cosine inside buckets, keep pairs >= threshold.
    * The bucket key bounds the join fan-out the same way LSH bands do. */
  def embeddingNearDups(embs: DataFrame, idCol: String, vecCol: String,
      prefixBits: Int = 16, threshold: Double = 0.95): DataFrame = {
    val bucketed = embs.select(
      col(idCol).as("doc_id"), col(vecCol).as("v"),
      concat_ws("", (0 until prefixBits).map(i =>
        when(element_at(col(vecCol), i + 1) > 0f, "1").otherwise("0")): _*).as("bucket"))
    bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("cosine", VectorFunctions.vecCosine(col("a.v"), col("b.v")))
      .filter(col("cosine") >= threshold)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        round(col("cosine"), 6).as("cosine"))
  }
}
