package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Persisted positional inverted index (X172): the
  * [[TextAnalysis.positionalPostings]] table materialized in
  * `tbucket=N` parquet directory partitions keyed by a term-hash bucket
  * — the storage design [[TextAnalysis.positionalPostings]]'s scaladoc
  * promises ("write this table bucketed by term and phrase/proximity
  * queries never rescan the corpus"), realized with the engine's
  * directory-partition discipline (the [[IvfIndex]] `ivf_list=N` /
  * sidecar `abucket=N` family) so a term lookup becomes
  * PartitionFilters-pruned I/O: only the queried terms' bucket
  * directories are listed, opened, or decoded — ≈ |terms|/B of the
  * postings, from the file listing alone (plan-audited in the suite).
  *
  * [[termPostings]] output is schema-identical to the in-memory
  * postings slice, so [[TextAnalysis.phraseMatch]] /
  * [[TextAnalysis.proximityMatch]] compose unchanged — the index is
  * pure I/O, bit-identical results (q213 reuses q117's oracle
  * verbatim). [[append]] is directory-additive like [[IvfIndex.append]]
  * — new documents' postings land as new files in their term buckets,
  * batch-proportional, build(A)+append(B) ≡ build(A ∪ B) (suite-pinned;
  * postings are per-doc-independent rows). Document deletion is NOT
  * in-place (a doc's terms scatter across every bucket — work would be
  * ∝ the index): anti-join downstream or rebuild, documented. */
final class InvertedIndex(spark: SparkSession, path: String,
    buckets: Int = 16) {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  private def postingsPath = s"$path/postings"
  private def metaPath = s"$path/meta"

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The engine-wide 28-bit md5 bucket (the minhash/sidecar idiom) —
    * Column form for writes, Scala form for query-time pruning; the
    * suite pins their agreement. */
  private def bucketCol(term: Column, b: Int): Column =
    pmod(conv(substring(md5(term), 1, 7), 16, 10).cast(LongType), lit(b.toLong))
      .cast(IntegerType)

  private[graft] def bucketOf(term: String, b: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString.take(7)
    (java.lang.Long.parseLong(hex, 16) % b).toInt
  }

  private def readBuckets(): Int =
    spark.read.parquet(metaPath).head().getInt(0)

  private def doclensPath = s"$path/doclens"

  /** Tokenize and write the partitioned postings layout plus the
    * (doc_id, dl) doclens table — the corpus-stat side BM25 needs
    * without rescanning text. One generate pass, shuffle-free
    * partitioned write + one doc-keyed aggregate; B is recorded in a
    * one-row meta parquet (the [[IvfIndex]] sidecar-meta rule, so later
    * sessions and appends agree on the hash). */
  def build(docs: DataFrame, idCol: String, text: Column): Unit = {
    import spark.implicits._
    Seq(buckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(metaPath)
    val postings = TextAnalysis.positionalPostings(docs, idCol, text)
      .localCheckpoint(true) // two consumers: the layout write + doclens
    postings
      .withColumn("tbucket", bucketCol(col("term"), buckets))
      .write.mode("overwrite").partitionBy("tbucket").parquet(postingsPath)
    postings.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode("overwrite").parquet(doclensPath)
    graft.util.Pins.release(postings)
  }

  /** Append new documents' postings and doclens — directory-additive,
    * work ∝ the batch. Uses the STORED bucket count, not this
    * instance's. New doc_ids must be disjoint from the stored ones (the
    * usual append contract — a re-sent doc would double its postings
    * AND its doclens row). */
  def append(docs: DataFrame, idCol: String, text: Column): Unit = {
    val b = readBuckets()
    val postings = TextAnalysis.positionalPostings(docs, idCol, text)
      .localCheckpoint(true)
    postings
      .withColumn("tbucket", bucketCol(col("term"), b))
      .write.mode("append").partitionBy("tbucket").parquet(postingsPath)
    postings.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      .write.mode("append").parquet(doclensPath)
    graft.util.Pins.release(postings)
  }

  /** BM25 top-k over the index (X173): tf from the PRUNED postings
    * buckets, dl/N/avgdl from the stored doclens — the
    * [[TextAnalysis.bm25TopK]] arithmetic ([[TextAnalysis.bm25Rank]]
    * shared core, bit-identical) with text never read. Per-query I/O =
    * the query terms' buckets + the (doc_id, dl) table. */
  def bm25(queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "no query terms")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate term in $queryTerms")
    require(k > 0, s"k must be positive, got $k")
    val terms = queryTerms.zipWithIndex
    val tf = termPostings(queryTerms)
      .groupBy(col("doc_id"))
      .agg(terms.head match { case (t, i) =>
        count(when(col("term") === t, 1)).as(s"tf$i") },
        terms.tail.map { case (t, i) =>
          count(when(col("term") === t, 1)).as(s"tf$i") }: _*)
    val perDoc = spark.read.parquet(doclensPath)
      .join(tf, Seq("doc_id"), "left")
      .na.fill(0L, terms.map { case (_, i) => s"tf$i" })
    TextAnalysis.bm25Rank(perDoc, queryTerms.size, k, k1, b)
  }

  /** The postings of exactly `terms`, read from their pruned bucket
    * directories only — schema-identical to an in-memory
    * [[TextAnalysis.positionalPostings]] slice, so phrase/proximity
    * operators compose unchanged. */
  def termPostings(terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(terms.forall(_.nonEmpty), s"empty term in $terms")
    val b = readBuckets()
    val bs = terms.map(bucketOf(_, b)).distinct.sorted
    spark.read.parquet(postingsPath)
      .filter(col("tbucket").isin(bs: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("pos"), col("term"))
  }
}
