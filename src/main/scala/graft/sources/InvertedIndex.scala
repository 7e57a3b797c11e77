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
  * postings are per-doc-independent rows).
  *
  * Deletion (X175) is the tombstone model every production inverted
  * index uses (Lucene's live-docs design): a doc's terms scatter across
  * every bucket, so IN-PLACE removal would rewrite work ∝ the index per
  * batch — instead [[delete]] appends the ids to a tiny `tombstones/`
  * table (O(batch) I/O, postings untouched) and every read path
  * ([[termPostings]], [[bm25]]) anti-joins the broadcast tombstone set
  * from both the postings slice and the doclens table, so phrase hits
  * AND corpus stats (N, avgdl, df) see exactly the surviving corpus —
  * bit-identical to an index rebuilt without the deleted docs
  * (suite-pinned; q217 gates it against q214's oracle + a WHERE).
  * [[vacuum]] amortizes the physical removal: one anti-join rewrite of
  * postings and doclens staged next to the live dirs, swapped in by the
  * engine's two-rename crash contract (`.bak` visible ⇒ [[recover]]
  * rolls back or completes), tombstones cleared LAST — a crash anywhere
  * leaves reads correct, because an anti-join against already-removed
  * ids is a no-op. */
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
  private def tombstonesPath = s"$path/tombstones"

  /** Roll a crashed [[vacuum]] swap forward or back: a visible
    * `.<dir>.bak` with the live dir missing means the crash hit between
    * the two renames — restore the backup; with the live dir present the
    * swap completed — drop the stale backup. Run at every entry point
    * that touches postings or doclens (the [[IvfIndex]] recoverDir
    * rule). */
  private def recover(): Unit =
    Seq(postingsPath, doclensPath).foreach { live =>
      val liveP = new Path(live)
      val bak = new Path(liveP.getParent, s".${liveP.getName}.bak")
      if (fs.exists(bak)) {
        if (!fs.exists(liveP)) {
          if (!fs.rename(bak, liveP)) sys.error(s"could not restore $bak")
        } else fs.delete(bak, true)
      }
    }

  /** Tokenize and write the partitioned postings layout plus the
    * (doc_id, dl) doclens table — the corpus-stat side BM25 needs
    * without rescanning text. One generate pass, shuffle-free
    * partitioned write + one doc-keyed aggregate; B is recorded in a
    * one-row meta parquet (the [[IvfIndex]] sidecar-meta rule, so later
    * sessions and appends agree on the hash). */
  def build(docs: DataFrame, idCol: String, text: Column): Unit = {
    import spark.implicits._
    recover()
    fs.delete(new Path(tombstonesPath), true) // fresh build = fresh live set
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
    * instance's. New doc_ids must be disjoint from the stored ones —
    * including TOMBSTONED ids (a re-sent live doc would double its
    * postings and doclens row; a re-sent tombstoned id would stay masked
    * until [[vacuum]] clears the tombstone — run vacuum before
    * re-inserting a deleted id). */
  def append(docs: DataFrame, idCol: String, text: Column): Unit = {
    recover()
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

  /** Every doc_id ever appended — the doclens key set, tombstoned docs
    * INCLUDED until [[vacuum]] physically removes them. This is the
    * replay-guard membership surface for streaming ingest
    * ([[graft.streaming.IndexIngest]]): a replayed at-least-once batch of
    * a doc that was later tombstoned must still be recognized as
    * already-ingested (re-appending it would resurrect the doc), so the
    * guard is deliberately NOT [[liveOnly]]-filtered. */
  def appendedIds: DataFrame = {
    recover()
    spark.read.parquet(doclensPath).select(col("doc_id"))
  }

  /** Logical deletion (X175): append the ids to the tombstone table —
    * O(batch) I/O, no postings or doclens files touched. Deleting an id
    * that is not in the index is a harmless no-op (the anti-join finds
    * nothing to mask). Takes effect on the very next read; [[vacuum]]
    * later makes it physical. */
  def delete(ids: DataFrame): Unit = {
    require(ids.columns.toSeq == Seq("doc_id"),
      s"ids must be a single-column (doc_id) frame, got ${ids.columns.toSeq}")
    ids.write.mode("append").parquet(tombstonesPath)
  }

  /** Anti-join the broadcast tombstone set out of a doc_id-keyed frame —
    * the read-side half of the tombstone contract. No tombstone table ⇒
    * the frame passes through untouched (zero plan change for an index
    * that never deleted, so q213/q214 stay bit-identical). */
  private def liveOnly(df: DataFrame): DataFrame =
    if (fs.exists(new Path(tombstonesPath)))
      df.join(broadcast(spark.read.parquet(tombstonesPath)
          .select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_anti")
    else df

  /** Physically remove tombstoned docs (X175): ONE anti-join rewrite
    * each of postings (partition layout preserved) and doclens, staged
    * as hidden siblings then swapped in by the two-rename crash
    * contract; tombstones are cleared LAST, so a crash at ANY point
    * leaves reads correct — [[recover]] completes or rolls back a
    * half-done swap, and an anti-join against already-vacuumed ids is a
    * no-op. Run when the tombstone set has grown enough that the
    * broadcast + read-side anti-join is worth amortizing away (the
    * caller's policy, like [[IvfIndex.compact]]). */
  def vacuum(): Unit = {
    recover()
    if (!fs.exists(new Path(tombstonesPath))) return
    val ts = broadcast(spark.read.parquet(tombstonesPath)
      .select(col("doc_id")).distinct())
    stageSwap(postingsPath, Some("tbucket")) { live =>
      live.join(ts, Seq("doc_id"), "left_anti") }
    stageSwap(doclensPath, None) { live =>
      live.join(ts, Seq("doc_id"), "left_anti") }
    fs.delete(new Path(tombstonesPath), true)
  }

  /** LIVE (term, df) vocabulary census — the serving input for
    * [[graft.operators.TextAnalysis.fuzzySuggestVocab]] ("did you
    * mean") and any term-statistics consumer: document frequency per
    * term over the live postings, tombstones excluded. One full-layout
    * scan of (tbucket, term, doc_id) — the text itself is never read;
    * serve-side callers typically cache or persist this table and
    * refresh it on the [[compact]]/[[vacuum]] cadence. */
  def vocab(): DataFrame = {
    recover()
    liveOnly(spark.read.parquet(postingsPath))
      .groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))
  }

  /** Per-bucket LIVE-postings census (X181) — the index-health surface
    * an operator watches: posting/term/doc counts per term bucket
    * expose hash skew (a hot bucket slows every query whose term lands
    * there) and, against [[fileStats]], how much dead weight tombstones
    * are masking (vacuum policy). Tombstoned docs are excluded — this
    * reports what queries actually see. One full-layout scan by design:
    * it is the monitoring pass, run at monitoring cadence. */
  def stats(): DataFrame = {
    recover()
    liveOnly(spark.read.parquet(postingsPath))
      .groupBy(col("tbucket"))
      .agg(count(lit(1)).as("n_postings"),
        count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** Part-file counts per bucket directory — the [[compact]]-policy
    * input, from the file listing alone (no data read). */
  def fileStats(): DataFrame = {
    recover()
    import spark.implicits._
    fs.listStatus(new Path(postingsPath))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("tbucket="))
      .map { s =>
        (s.getPath.getName.stripPrefix("tbucket=").toInt,
          fs.listStatus(s.getPath).count(_.getPath.getName.startsWith("part-")))
      }.toSeq.toDF("tbucket", "n_files")
  }

  /** Small-file compaction (X178): every [[append]] (and every
    * [[graft.streaming.IndexIngest]] micro-batch) adds one part-file to
    * ESSENTIALLY EVERY `tbucket=N` directory — a batch's terms scatter
    * across the whole hash range, unlike an IVF append's few touched
    * lists — so a long-running ingest accretes files uniformly until
    * open/seek overhead dominates the pruned read. The honest unit of
    * compaction is therefore the WHOLE layout: one job rewrites postings
    * to a single file per term bucket (rows hash to one shuffle
    * partition per bucket value) and doclens to `doclensFiles` files
    * (1 for tests; size it ∝ corpus at scale), each swapped in under
    * the same two-rename crash contract as [[vacuum]]. Content is
    * bit-identical (suite-pinned); running [[vacuum]] then compact is
    * the classic merge step a segment-based index performs. WHEN to
    * compact is the caller's read of file counts (the [[IvfIndex]]
    * monitoring convention). */
  def compact(doclensFiles: Int = 1): Unit = {
    require(doclensFiles >= 1, s"doclensFiles must be >= 1, got $doclensFiles")
    recover()
    stageSwap(postingsPath, Some("tbucket")) { live =>
      live.repartition(col("tbucket")) }
    stageSwap(doclensPath, None) { live =>
      live.repartition(doclensFiles) }
  }

  /** Stage `transform(live)` as a hidden sibling of `live`, then swap it
    * in via backup-rename + staged-rename (the engine-wide two-rename
    * discipline). A transform that deletes EVERY row still stages a
    * schema-carrying empty file so later whole-layout reads can infer
    * the schema (the [[IvfIndex]] emptied-partition rule). */
  private def stageSwap(live: String, partCol: Option[String])(
      transform: DataFrame => DataFrame): Unit = {
    val liveP = new Path(live)
    val staging = new Path(liveP.getParent, s".${liveP.getName}.staging")
    fs.delete(staging, true)
    val survivors = transform(spark.read.parquet(live))
    partCol match {
      case Some(c) => survivors.write.partitionBy(c).parquet(staging.toString)
      case None    => survivors.write.parquet(staging.toString)
    }
    val hasData = fs.listStatus(staging)
      .exists(s => !s.getPath.getName.startsWith("_"))
    if (!hasData) partCol match {
      case Some(c) => survivors.drop(c).limit(0).coalesce(1)
        .write.parquet(new Path(staging, s"$c=0").toString)
      case None => survivors.limit(0).coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
    }
    val bak = new Path(liveP.getParent, s".${liveP.getName}.bak")
    fs.delete(bak, true)
    if (!fs.rename(liveP, bak))
      sys.error(s"could not back up $live for swap")
    if (!fs.rename(staging, liveP))
      sys.error(s"could not swap $staging into $live (backup at $bak)")
    fs.delete(bak, true)
  }

  /** BM25 top-k over the index (X173): tf from the PRUNED postings
    * buckets, dl/N/avgdl from the stored doclens — the
    * [[TextAnalysis.bm25TopK]] arithmetic ([[TextAnalysis.bm25Rank]]
    * shared core, bit-identical) with text never read. Per-query I/O =
    * the query terms' buckets + the (doc_id, dl) table.
    *
    * `msm` is minimum-should-match (X184, the Lucene/ES semantics): a
    * doc must contain at least `msm` DISTINCT query terms to score —
    * the precision knob between pure-OR (1, the default, unchanged
    * plans) and pure-AND (|terms|). The gate is a per-row predicate on
    * the tf columns the ranking already computed, applied AFTER the
    * stats aggregate — N/avgdl/df stay corpus-wide, exactly as
    * Lucene's msm leaves idf untouched: zero extra I/O, zero extra
    * exchanges, and it shrinks the ranked set BEFORE the top-k heap. */
  def bm25(queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, msm: Int = 1): DataFrame = {
    require(queryTerms.nonEmpty, "no query terms")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate term in $queryTerms")
    require(k > 0, s"k must be positive, got $k")
    require(msm >= 1 && msm <= queryTerms.size,
      s"msm must be in [1, ${queryTerms.size}], got $msm")
    val terms = queryTerms.zipWithIndex
    val tf = termPostings(queryTerms)
      .groupBy(col("doc_id"))
      .agg(terms.head match { case (t, i) =>
        count(when(col("term") === t, 1)).as(s"tf$i") },
        terms.tail.map { case (t, i) =>
          count(when(col("term") === t, 1)).as(s"tf$i") }: _*)
    val perDoc = liveOnly(spark.read.parquet(doclensPath))
      .join(tf, Seq("doc_id"), "left")
      .na.fill(0L, terms.map { case (_, i) => s"tf$i" })
    val gate = if (msm == 1) lit(true) else
      terms.map { case (_, i) => when(col(s"tf$i") > 0, 1).otherwise(0) }
        .reduce(_ + _) >= msm
    TextAnalysis.bm25Rank(perDoc, queryTerms.size, k, k1, b, gate)
  }

  /** The postings of exactly `terms`, read from their pruned bucket
    * directories only — schema-identical to an in-memory
    * [[TextAnalysis.positionalPostings]] slice, so phrase/proximity
    * operators compose unchanged. */
  def termPostings(terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    require(terms.forall(_.nonEmpty), s"empty term in $terms")
    recover()
    val b = readBuckets()
    val bs = terms.map(bucketOf(_, b)).distinct.sorted
    liveOnly(spark.read.parquet(postingsPath)
      .filter(col("tbucket").isin(bs: _*))
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("pos"), col("term")))
  }
}
