package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ann

/** Persisted IVF index (X112): the inverted lists materialized as
  * `ivf_list=N` parquet DIRECTORY partitions, centroids stored beside
  * them — so an nprobe search is partition-PRUNED I/O, not an in-memory
  * filter. [[graft.operators.Ann.ivfTopK]] proves the algorithm but
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
}
