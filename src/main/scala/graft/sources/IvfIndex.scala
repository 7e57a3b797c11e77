package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Ann, Pq}

/** Persisted IVF index (X112): the inverted lists materialized as
  * `ivf_list=N` parquet DIRECTORY partitions, centroids stored beside
  * them — so an nprobe search is partition-PRUNED I/O, not an in-memory
  * filter. (IVF/IVFADC: Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the engineered layout popularized by
  * FAISS — Johnson et al., arXiv:1702.08734.) [[graft.operators.Ann.ivfTopK]] proves the algorithm but
  * still SCANS the whole corpus and discards (k-nprobe)/k of it after
  * decode; at 100 TB the scan is the cost, and the only way to not pay
  * it is for the probe predicate to reach the file listing. Here
  * `search` filters on the partition column, so Catalyst turns the
  * probe set into `PartitionFilters` and the scan never opens a
  * non-probed list directory — I/O ≈ nprobe/k of the corpus
  * (plan-audited).
  *
  * Layout: `<path>/lists/ivf_list=N/...` carries (id, vector) per list;
  * `<path>/centroids` carries (cid, centroid) — k rows, read to the
  * driver at search time (the bounded-scalar-anchor class: centroid
  * scoring is k dot products, never a distributed job).
  *
  * The assignment rule is [[graft.operators.Ann.ivfAssign]] (argmax
  * dot, lowest centroid id on ties) and search scoring is
  * [[graft.operators.Ann.bruteForceTopK]] over the probed lists —
  * bit-identical to the unpersisted path (suite-pinned), so the index
  * is a pure I/O optimization, not a semantics change. Rebuild after
  * re-training centroids; like any IVF, a stale index degrades recall,
  * not correctness of the "within probed lists" contract. */
final class IvfIndex(spark: SparkSession, path: String) {

  private def listsPath = s"$path/lists"
  private def centroidsPath = s"$path/centroids"

  /** Assign every row to its list and write the partitioned layout.
    * One broadcast-assignment pass over `embs`, one shuffle-free write;
    * k is the partition fan-out (keep it far below the row count — the
    * usual √n-ish coarse-quantizer sizing). */
  def build(embs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Float]]): Unit = {
    require(centroids.nonEmpty, "need at least one centroid")
    import spark.implicits._
    Ann.ivfAssign(embs.select(col(idCol).as("id"), col(vecCol).as("vector")),
        "vector", centroids)
      .write.mode("overwrite").partitionBy("ivf_list").parquet(listsPath)
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath)
  }

  /** Incremental append (X124): assign NEW rows against the FROZEN
    * stored centroids and append their files into the existing
    * `ivf_list=N` partition directories — index maintenance without a
    * rebuild, the operation a continuously-ingesting corpus performs
    * between (much rarer) re-trainings. Because [[graft.operators.Ann
    * .ivfAssign]] is deterministic per row and independent across rows,
    * an index built on A then appended with B is file-layout-append but
    * RESULT-identical to one built on A ∪ B with the same centroids —
    * search parity is suite-pinned across an (nprobe, k) grid and
    * oracle-gated (q167). Parquet append is directory-additive: existing
    * files are never touched, so a crashed append leaves at worst
    * orphan part-files in probed directories — re-run with the same
    * batch after dedup, never rebuild.
    *
    * Same scale shape as [[build]]: one broadcast-assignment pass over
    * the batch, a shuffle-free partitioned write proportional to the
    * BATCH, not the index. Centroid drift is the operator's contract to
    * monitor ([[graft.operators.Ann.ivfStats]] imbalance on the growing
    * index); a drifted coarse quantizer degrades recall, not the
    * within-probed-lists exactness. */
  def append(embs: DataFrame, idCol: String, vecCol: String): Unit = {
    val cs = centroids()
    Ann.ivfAssign(embs.select(col(idCol).as("id"), col(vecCol).as("vector")),
        "vector", cs)
      .write.mode("append").partitionBy("ivf_list").parquet(listsPath)
  }

  /** Delete ids from the index in place (X129; the other half of
    * steady-state maintenance next to [[append]]): anti-join each TOUCHED
    * inverted list against the id set and swap in the rewritten
    * directory. Work ∝ the lists the deleted ids live in — untouched
    * `ivf_list=N` directories are never read or written, the same
    * point-update economics as [[EmbeddingStore]]'s bucket rewrites.
    *
    * `ids` is a single-column (`id`) frame, so a corpus-scale deletion
    * set never collects to the driver; only the touched-list NUMBERS do
    * (bounded by k, the bounded-scalar-anchor class). Each list swap is
    * the two-rename discipline with a hidden `.bak` (crash between
    * renames leaves either the old or the new directory plus a hidden
    * backup — never both visible; [[recoverLists]] restores a half-done
    * swap before the next read). A list whose every row is deleted
    * remains as an empty directory — harmless to partition discovery. */
  def delete(ids: DataFrame): Unit = {
    require(ids.columns.toSeq == Seq("id"),
      s"ids must be a single-column (id) frame, got ${ids.columns.toSeq}")
    recoverLists()
    val touched = spark.read.parquet(listsPath)
      .join(ids, Seq("id")).select(col("ivf_list"))
      .distinct().collect().map(_.getInt(0))
    touched.foreach { n =>
      val dir = new Path(s"$listsPath/ivf_list=$n")
      val survivors = spark.read.parquet(dir.toString)
        .join(ids, Seq("id"), "left_anti")
      val tmp = new Path(s"$listsPath/.tmp_list_$n")
      survivors.write.mode("overwrite").parquet(tmp.toString)
      val bak = new Path(listsPath, s".ivf_list=$n.bak")
      fs.delete(bak, true)
      if (!fs.rename(dir, bak))
        sys.error(s"could not back up $dir for swap")
      if (!fs.rename(tmp, dir))
        sys.error(s"could not swap $tmp into $dir (backup at $bak)")
      fs.delete(bak, true)
    }
  }

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Crash recovery for [[delete]]'s two-rename swaps: a hidden
    * `.ivf_list=N.bak` with no live dir means the crash hit between the
    * renames — restore the backup; with a live dir present the crash hit
    * after the second rename — drop the stale backup. */
  private def recoverLists(): Unit =
    Option(fs.globStatus(new Path(listsPath, ".ivf_list=*.bak")))
      .toSeq.flatten.foreach { st =>
        val live = new Path(listsPath,
          st.getPath.getName.stripPrefix(".").stripSuffix(".bak"))
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            sys.error(s"could not restore ${st.getPath} to $live")
        } else fs.delete(st.getPath, true)
      }

  /** The stored centroids, ordered by cid. */
  def centroids(): Seq[Array[Float]] =
    spark.read.parquet(centroidsPath).orderBy(col("cid"))
      .collect().map(_.getSeq[Float](1).toArray).toSeq

  /** Exact cosine top-k WITHIN the nprobe best lists for `query` —
    * [[graft.operators.Ann.ivfTopK]] semantics, but the probe set
    * becomes a partition filter: only `nprobe` of the k list
    * directories are listed, opened, or decoded. */
  def search(query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
    recoverLists()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val probes = centroids().zipWithIndex
      .map { case (c, i) => (i, dot(c, query)) }
      .sortBy { case (i, d) => (-d, i) }
      .take(nprobe).map(_._1)
    val probed = spark.read.parquet(listsPath)
      .filter(col("ivf_list").isin(probes: _*))
    Ann.bruteForceTopK(probed, "id", "vector", query, k)
  }

  // ---- IVF×PQ layout (the FAISS-IVFPQ on-disk shape) ---------------------

  private def codesPath = s"$path/codes"
  private def booksPath = s"$path/codebooks"

  /** Persist the PQ-coded lists: (id, codes) partitioned by `ivf_list`,
    * codebooks stored beside them. The probed read then decodes m BYTES
    * per row instead of the raw vector — on top of X112's nprobe/k
    * directory pruning, search I/O drops by another dim·4/m — the full
    * FAISS-IVFPQ economics, from the parquet layout alone. The raw
    * vectors are NOT duplicated here: exact rerank (when wanted)
    * re-fetches the few topK survivors from the primary store by id —
    * the flagship funnel's stage-3 refetch pattern. */
  def buildPq(embs: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Array[Float]], books: Pq.Codebooks): Unit = {
    require(coarse.nonEmpty, "need at least one coarse centroid")
    import spark.implicits._
    Pq.encode(
        Ann.ivfAssign(embs.select(col(idCol).as("id"), col(vecCol).as("vector")),
          "vector", coarse), "vector", books)
      .select(col("id"), col("codes"), col("ivf_list"))
      .write.mode("overwrite").partitionBy("ivf_list").parquet(codesPath)
    books.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(booksPath)
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centroidsPath)
  }

  /** The stored PQ codebooks, (subspace, code)-ordered. */
  def codebooks(): Pq.Codebooks = {
    val rows = spark.read.parquet(booksPath)
      .orderBy(col("subspace"), col("code")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
  }

  /** ADC top-k over the probed CODE lists — [[graft.operators.Pq
    * .ivfAdcTopK]] semantics with the probe as a partition filter and
    * the LUT scoring m-byte codes straight off the pruned scan. */
  def searchPq(query: Array[Float], topK: Int, nprobe: Int): DataFrame = {
    require(topK >= 1, s"topK must be positive, got $topK")
    require(nprobe >= 1, s"nprobe must be positive, got $nprobe")
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val probes = centroids().zipWithIndex
      .map { case (c, i) => (i, dot(c, query)) }
      .sortBy { case (i, d) => (-d, i) }
      .take(nprobe).map(_._1)
    val probed = spark.read.parquet(codesPath)
      .filter(col("ivf_list").isin(probes: _*))
    Pq.adcTopK(probed, "id", "codes", codebooks(), query, topK)
  }
}
