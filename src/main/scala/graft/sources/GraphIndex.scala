package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.GraphAnn

/** Persisted proximity-graph layout (the storage side of X300/X301):
  * the bounded-degree adjacency lives in `gbucket=N` directory
  * partitions keyed by `hash(src) % buckets`, so a beam hop reads
  * EXACTLY the frontier's buckets at the file listing — the
  * [[IvfIndex]] nprobe→PartitionFilters discipline applied to graph
  * serving. Per hop the frontier's bucket set collects driver-side
  * (≤ `buckets` small ints, bounded regardless of beam width) and
  * rides the edge read as an `isin` partition filter; frontier ids
  * then equi-join the pruned slice, so hop I/O is
  * ∝ |frontier-buckets|/buckets of the edge mass, never the graph.
  *
  * Lifecycle, honestly scoped:
  *  - [[build]] validates and writes the partitioned edges + a one-row
  *    meta (bucket count) and clears tombstones (fresh build = fresh
  *    live set). Build is the only edge writer, so it follows the
  *    [[EmbeddingStore.bulkLoad]] precedent — a direct overwrite, no
  *    two-rename: a crashed build is an incomplete NEW store the
  *    caller re-runs, not a corrupted live one.
  *  - [[delete]] is the FreshDiskANN lazy delete (Singh et al.,
  *    2105.09613): ids append to a tiny `tombstones/` table, O(batch)
  *    I/O, edge files untouched. Deleted nodes keep ROUTING — their
  *    edges still carry the walk, which is what preserves
  *    navigability — but never RETURN ([[searchTopK]] anti-joins the
  *    broadcast tombstone set before the final cut).
  *  - There is deliberately NO edge-rewriting vacuum/compact: removing
  *    a tombstoned node's edges without re-patching its neighbors'
  *    neighborhoods (FreshDiskANN's StreamingMerge) breaks the graph
  *    property the α-prune established, silently degrading recall.
  *    Space reclamation = [[build]] from the current embedding store —
  *    the X300 build is rounds-bounded, and rebuild-on-cadence is the
  *    stated maintenance policy (the same answer EmbeddingStore gives
  *    for bucket skew).
  *  - [[snapshot]] copies the whole tree via hidden staging + rename
  *    (the engine-wide snapshot contract).
  */
final class GraphIndex(spark: SparkSession, path: String, buckets: Int = 16) {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  private def edgesPath = s"$path/edges"
  private def metaPath = s"$path/meta"
  private def tombstonesPath = s"$path/tombstones"

  private def fs =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(c: Column): Column = pmod(hash(c), lit(buckets))

  /** Persist a `(src, dst[, cosine])` adjacency (e.g.
    * [[graft.operators.GraphAnn.buildVamana]]'s output, or an exact
    * kNN digraph at validation scale). */
  def build(adj: DataFrame): Unit = {
    val cols = adj.columns.toSeq
    require(cols.contains("src") && cols.contains("dst"),
      s"adjacency needs (src, dst[, cosine]) columns, got $cols")
    val keep = Seq("src", "dst") ++ (if (cols.contains("cosine")) Seq("cosine") else Nil)
    adj.select(keep.map(col): _*)
      .withColumn("src", col("src").cast(LongType))
      .withColumn("dst", col("dst").cast(LongType))
      .withColumn("gbucket", bucketOf(col("src")))
      .write.mode("overwrite").partitionBy("gbucket").parquet(edgesPath)
    spark.range(1).select(lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(metaPath)
    fs.delete(new Path(tombstonesPath), true)
  }

  /** Stored bucket count — a reopened handle must agree with the
    * layout on disk or every hop would prune the WRONG directories. */
  private def storedBuckets(): Int = {
    val b = spark.read.parquet(metaPath).head().getInt(0)
    require(b == buckets,
      s"store at $path was built with $b buckets, this handle says $buckets")
    b
  }

  /** Live (src, dst) edge view — a full read, for diagnostics and
    * parity tests; serving goes through the pruned per-hop reads. */
  def edges(): DataFrame =
    spark.read.parquet(edgesPath).select(col("src"), col("dst"))

  /** Lazy delete: append ids to the tombstone table (O(batch)); the
    * nodes keep routing but stop returning on the next search. */
  def delete(ids: DataFrame): Unit = {
    require(ids.columns.toSeq == Seq("id"),
      s"ids must be a single-column (id) frame, got ${ids.columns.toSeq}")
    ids.select(col("id").cast(LongType))
      .write.mode("append").parquet(tombstonesPath)
  }

  private def tombstoneIds(): Option[DataFrame] =
    if (fs.exists(new Path(tombstonesPath)))
      Some(spark.read.parquet(tombstonesPath).select(col("id")).distinct())
    else None

  /** Per-bucket part-file counts (the sibling observability surface):
    * edges are build-once so counts reflect the writer's partitioning,
    * plus the tombstone file count — the rebuild-cadence signal. */
  def fileStats(): DataFrame = {
    import spark.implicits._
    val rows = Option(fs.listStatus(new Path(edgesPath))).toSeq.flatten
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gbucket="))
      .map { s =>
        (s.getPath.getName.stripPrefix("gbucket=").toInt,
          fs.listStatus(s.getPath).count(_.getPath.getName.startsWith("part-")))
      }
    rows.toDF("gbucket", "n_files").orderBy(col("gbucket"))
  }

  /** Beam search served from the persisted layout: the X301 loop with
    * per-hop PARTITION-PRUNED edge reads and the lazy-tombstone result
    * filter. Hop pruning collects the frontier's bucket set (≤
    * `buckets` ints, bounded for ANY beam width incl. the exhaustive
    * oracle walk) and pushes it as a partition `isin` — plan-audited
    * in the suite. */
  def searchTopK(embs: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, beamWidth: Int, maxHops: Int = 64,
      entryId: Option[Long] = None): DataFrame = {
    storedBuckets()
    val hopEdges = (frontier: DataFrame) => {
      val bs = frontier.select(bucketOf(col("id")).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      spark.read.parquet(edgesPath)
        .filter(col("gbucket").isin(bs: _*))
        .select(col("src"), col("dst"))
    }
    val resultFilter = (visited: DataFrame) => tombstoneIds() match {
      case Some(ts) => visited.join(broadcast(ts), Seq("id"), "left_anti")
      case None => visited
    }
    GraphAnn.beamCore(hopEdges, resultFilter, embs, idCol, vecCol, query,
      k, beamWidth, maxHops, entryId)
  }

  /** Consistent on-disk snapshot: hidden staging + rename, the
    * engine-wide contract ([[EmbeddingStore.snapshot]]). Edges are
    * build-once and tombstones append-only, so there is no swap to
    * quiesce — the copy is consistent as long as no build/delete runs
    * concurrently (the single-writer discipline all layouts share). */
  def snapshot(targetPath: String): Unit = {
    val dst = new Path(targetPath)
    require(!fs.exists(dst), s"snapshot target $targetPath already exists")
    val staging = new Path(dst.getParent, s".${dst.getName}.snapstaging")
    fs.delete(staging, true)
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, new Path(path), fs, staging,
        false, spark.sparkContext.hadoopConfiguration))
      sys.error(s"snapshot copy to $staging failed")
    if (!fs.rename(staging, dst))
      sys.error(s"could not publish snapshot $staging -> $targetPath")
  }
}
