package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._
import graft.util.DenseIds

/** Parquet-backed embedding store (SURVEY.md §2.1 S1-S12).
  *
  * The reference is a MySQL table with row-at-a-time CRUD
  * (`src/VectorTable.php:241-456`); here mutation is set-oriented
  * read->transform->atomic-swap over Parquet (no ACID table format in this
  * environment). Derived columns (`normalized_vector`, `binary_code`,
  * `magnitude` — `src/VectorTable.php:353-356,383`) are computed once at
  * write time, exactly like the reference materializes them at upsert.
  *
  * Scale notes (100 TB design point):
  *  - the store is hash-bucketed by `post_id` into `numBuckets` directory
  *    partitions (`bucket=NNN`), so point mutations rewrite only the touched
  *    bucket, not the whole table — the Parquet analogue of the reference's
  *    per-row UPDATE;
  *  - reads are plain `spark.read.parquet` with pushdown: filters on
  *    `bucket`/`post_id`/`id` prune partitions and row groups;
  *  - the wide `vector` column is only read by stages that need it
  *    (Catalyst column pruning; see SearchEngine stage separation);
  *  - all path operations go through the Hadoop `FileSystem` API, so the
  *    store works on HDFS/S3A/local alike (rename is atomic on HDFS and
  *    local; on S3A the swap degrades to copy-and-delete but stays correct).
  */
final class EmbeddingStore(spark: SparkSession, path: String, numBuckets: Int = 64,
    prefixDims: Option[Int] = None) {
  require(prefixDims.forall(_ >= 1), s"prefixDims must be positive, got $prefixDims")
  import spark.implicits._

  /** The store root (for suites and layout-level tooling). */
  private[graft] def storePath: String = path

  private def bucketOf(c: Column) = pmod(hash(c), lit(numBuckets))

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---- store metadata ----------------------------------------------------
  // prefixDims must SURVIVE the handle: a store written with a prefix and
  // later reopened without the parameter would silently drop
  // `vector_prefix` from every rewritten bucket (and keep it on untouched
  // ones — a split-schema store). The dims are persisted in a one-line
  // metadata file at the store root on first load and read back as the
  // default; an explicit constructor value must agree with the stored one.
  private val metaPath = new Path(path, "_graft_meta")

  private def readStoredPrefixDims(): Option[Int] =
    if (!fs.exists(metaPath)) None
    else {
      val in = fs.open(metaPath)
      try {
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
        "\"prefixDims\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      } finally in.close()
    }

  private def writeMeta(dims: Int): Unit = {
    val out = fs.create(metaPath, true)
    try out.write(s"""{"prefixDims": $dims}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Constructor value if given (validated against disk), else whatever a
    * previous handle persisted. Evaluated lazily so a store handle can be
    * built before the directory exists. */
  private lazy val effectivePrefixDims: Option[Int] = {
    val stored = readStoredPrefixDims()
    (prefixDims, stored) match {
      case (Some(p), Some(s)) =>
        require(p == s, s"store at $path was built with prefixDims=$s, got $p " +
          "(re-derive the column explicitly rather than splitting the schema)")
        Some(p)
      case (Some(p), None) => Some(p)
      case (None, s) => s
    }
  }

  /** Derive the reference's materialized columns on a raw
    * `(post_id, sequence_no, vector, vector_type)` frame. With
    * `prefixDims` set, also materializes `vector_prefix` — the raw
    * first-k slice backing the matryoshka stage-1 index
    * ([[graft.operators.Ann.matryoshkaTopK]]): Parquet cannot prune
    * array ELEMENTS, so slicing the full `vector` in a query still
    * reads every float; a separate stored column is what turns the
    * prefix ranking into a k/dim-sized I/O pass at 100 TB (the same
    * split the store already does for `binary_code`). Raw slice, not
    * re-normalized: cosine normalizes per-pair, so ranking is identical
    * and the column stays update-free if dims are re-chosen. */
  def withDerived(raw: DataFrame): DataFrame = {
    val withCreated =
      if (raw.columns.contains("created_at")) raw
      else raw.withColumn("created_at", lit(null).cast(TimestampType))
    val derived = withCreated
      .withColumn("vector", col("vector").cast(ArrayType(FloatType)))
      .withColumn("magnitude", vecMagnitude(col("vector")))
      .withColumn("normalized_vector", vecNormalize(col("vector")))
      .withColumn("binary_code", packSignBits(col("vector")))
      .withColumn("created_at", coalesce(col("created_at"), current_timestamp()))
      .withColumn("updated_at", current_timestamp())
    effectivePrefixDims.fold(derived)(d =>
      derived.withColumn("vector_prefix", slice(col("vector"), 1, d)))
  }

  /** Assign `id`s at ingest: AUTO_INCREMENT (`src/VectorTable.php:470`) has
    * no distributed equivalent — ids are dense row numbers over the
    * insertion order. Delegates to [[DenseIds]] (range partition +
    * zipWithIndex), NOT a global window: a `Window.orderBy` with no
    * partitioning would funnel the whole load through one task. */
  def assignIds(df: DataFrame, startAt: Long = 1L): DataFrame =
    DenseIds.assign(df, "id", startAt, col("post_id"), col("sequence_no"))

  def read(): DataFrame = {
    recoverAll()
    spark.read.parquet(path)
  }

  /** Typed view of the store (SURVEY.md §1.3: `Dataset[Embedding]` where
    * compile-time safety helps; `DataFrame` at the dynamic API edges). */
  def typed(): org.apache.spark.sql.Dataset[graft.model.Embedding] = {
    import spark.implicits._
    read().drop("bucket")
      .select("id", "post_id", "sequence_no", "vector", "normalized_vector",
        "vector_type", "binary_code", "magnitude", "created_at", "updated_at")
      .as[graft.model.Embedding]
  }

  // ---- S1-S6, S10: reads -------------------------------------------------

  /** S1 full scan; the reference caps at 100k (`VectorTable.php:333`) —
    * capped variant kept for behavior parity. */
  def getAll(cap: Option[Int] = Some(100000)): DataFrame =
    cap.fold(read())(read().limit(_))

  /** S2 point lookup by id (Parquet pushdown prunes row groups). */
  def byId(id: Long): DataFrame = read().filter(col("id") === id)

  /** S3 multi-id lookup preserving caller's order — the Spark rewrite of
    * `ORDER BY FIELD(id, ...)` (`VectorTable.php:266`): join against the
    * input order and sort by it. */
  def byIds(ids: Seq[Long]): DataFrame = {
    if (ids.isEmpty) return read().limit(0)
    val order = ids.zipWithIndex.toDF("id", "__ord")
    read().join(broadcast(order), Seq("id"), "inner")
      .orderBy(col("__ord"))
      .drop("__ord")
  }

  /** S4 composite-key lookup. */
  def get(postId: Long, sequenceNo: Int): DataFrame =
    read().filter(col("post_id") === postId && col("sequence_no") === sequenceNo)

  /** S5 all vectors of one post. */
  def allForPost(postId: Long): DataFrame = read().filter(col("post_id") === postId)

  /** S6 latest row per post — window per post key instead of
    * ORDER BY ... LIMIT 1 (`VectorTable.php:313-320`). */
  def latestUpdated(postId: Long): DataFrame = {
    val w = Window.partitionBy(col("post_id")).orderBy(col("updated_at").desc, col("id").desc)
    allForPost(postId).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** S10 count. */
  def count(): Long = read().count()

  // ---- S7-S9: mutation (read -> transform -> atomic swap) ---------------

  /** S7 upsert: merge by (post_id, sequence_no). Unlike the reference's
    * UPDATE — which forgets to refresh `magnitude` (`VectorTable.php:361`,
    * documented bug) — all derived columns are recomputed. Rows matching an
    * existing key KEEP that key's id (the reference's UPDATE branch returns
    * the existing id, `VectorTable.php:370`); new keys get fresh ids past
    * the current max, assigned ONCE before any bucket is rewritten. Each
    * touched bucket then receives only ITS rows (hash(post_id) % buckets),
    * so a multi-bucket upsert can neither duplicate rows across bucket
    * directories nor misplace them. */
  def upsert(updates: DataFrame): Unit = {
    val prepared = withDerived(updates)
    val existing = read().select(col("post_id"), col("sequence_no"),
      col("id").as("__old_id"), col("created_at").as("__old_created_at"))
    val maxId = Option(read().agg(max(col("id"))).first().get(0)).fold(0L)(_.asInstanceOf[Long])
    val joined = prepared.join(existing, Seq("post_id", "sequence_no"), "left")
    val kept = joined.filter(col("__old_id").isNotNull)
      .withColumn("id", col("__old_id"))
      // an UPDATE keeps the row's original creation time (only updated_at
      // moves — the reference's timestamp semantics, VectorTable.php:478-479)
      .withColumn("created_at", coalesce(col("__old_created_at"), col("created_at")))
      .drop("__old_id", "__old_created_at")
    val fresh = assignIds(
      joined.filter(col("__old_id").isNull).drop("__old_id", "__old_created_at"), maxId + 1)
    writeStaged(kept.unionByName(fresh)) { staged =>
      val buckets = staged.select(bucketOf(col("post_id")).as("b")).distinct()
        .as[Int].collect().toSet
      rewriteBuckets(buckets) { (b, cur) =>
        val mine = staged.filter(bucketOf(col("post_id")) === b)
        val newKeys = mine.select(col("post_id").as("__np"), col("sequence_no").as("__ns")).distinct()
        val untouched = cur.join(broadcast(newKeys),
          cur("post_id") === col("__np") && cur("sequence_no") === col("__ns"), "left_anti")
        untouched.unionByName(mine.select(untouched.columns.map(col).toSeq: _*))
      }
    }
  }

  /** S8 replace-all-per-key: delete post's rows then insert the new set
    * (`VectorTable.php:401-425` does DELETE + row-at-a-time inserts).
    * Like upsert: ids assigned once up front, each bucket gets only its
    * own rows. */
  def insertAll(postId: Long, rows: DataFrame): Unit = {
    val maxId = Option(read().agg(max(col("id"))).first().get(0)).fold(0L)(_.asInstanceOf[Long])
    writeStaged(assignIds(withDerived(rows), maxId + 1)) { staged =>
      val buckets = (staged.select(bucketOf(col("post_id")).as("b"))
        .union(read().filter(col("post_id") === postId).select(bucketOf(col("post_id")).as("b"))))
        .distinct().as[Int].collect().toSet
      rewriteBuckets(buckets) { (b, cur) =>
        val mine = staged.filter(bucketOf(col("post_id")) === b)
        cur.filter(col("post_id") =!= postId)
          .unionByName(mine.select(cur.columns.map(col).toSeq: _*), allowMissingColumns = true)
      }
    }
  }

  /** S9 point delete (anti-join rewrite of the touched bucket). */
  def delete(id: Long): Unit = {
    val buckets = read().filter(col("id") === id)
      .select(bucketOf(col("post_id")).as("b")).distinct().as[Int].collect().toSet
    rewriteBuckets(buckets)((_, cur) => cur.filter(col("id") =!= id))
  }

  /** S9 at pipeline scale: set-oriented bulk delete. Groups the id set by
    * bucket and rewrites each TOUCHED bucket once — a per-id [[delete]]
    * loop costs |ids| read+rewrite passes, this costs |touched buckets|
    * regardless of how many ids fall in each (a crawl decommission deletes
    * millions of ids, not one). The resolved (id, bucket) set is pinned to
    * the hidden staging dir before any swap so the rewrite loop never
    * re-reads files it is replacing; only the matching ids travel — never
    * vectors — and untouched buckets are never opened. */
  def deleteMany(ids: DataFrame): Unit = {
    require(ids.columns.contains("id"),
      s"deleteMany needs an `id` column, got [${ids.columns.mkString(",")}]")
    val targets = read().join(ids.select(col("id")), Seq("id"), "left_semi")
      .select(col("id"), bucketOf(col("post_id")).as("__b"))
    writeStaged(targets) { staged =>
      val buckets = staged.select(col("__b")).distinct().as[Int].collect().toSet
      rewriteBuckets(buckets) { (b, cur) =>
        cur.join(staged.filter(col("__b") === b).select(col("id")), Seq("id"), "left_anti")
      }
    }
  }

  /** [[deleteMany]] over a driver-side id list (the small-batch admin path). */
  def deleteMany(ids: Seq[Long]): Unit = deleteMany(ids.toDF("id"))

  /** Predicate-scoped bulk delete: resolve the matching ids with ONE
    * store read, then delete them through the bucket-grouped
    * [[deleteMany]] path. `deleteWhere(col("vector_type") === "old")`
    * is the decommission-a-model call a pipeline actually makes — the
    * predicate benefits from pushdown/pruning on the resolve scan, and
    * only ids travel from there on. */
  def deleteWhere(predicate: Column): Unit =
    deleteMany(read().filter(predicate).select(col("id")))

  /** Sweep crash leftovers that the two-rename recovery cannot see:
    * `.tmp_bucket_*` dirs from a rewrite that died BEFORE its swap (its
    * backup/restore pair never existed) and a `.staging` dir from a
    * mutation that died before its finally-cleanup. Both are hidden
    * (dot-prefixed) so readers never see them — this is a SPACE leak,
    * not a correctness one — but a mutation-heavy store accretes them
    * forever without a vacuum. Never runs concurrently with a mutation
    * (same single-writer discipline as the mutations themselves).
    * Returns the number of directories removed. */
  def vacuum(): Int = {
    val stale = Seq(
      Option(fs.globStatus(new Path(path, ".tmp_bucket_*"))).toSeq.flatten,
      Option(fs.globStatus(new Path(path, ".staging"))).toSeq.flatten).flatten
    stale.count(st => fs.delete(st.getPath, true))
  }

  /** Per-bucket part-file counts — the [[graft.sources.IvfIndex.fileStats]]
    * observability surface on the primary table, making the store's
    * no-compaction claim CHECKABLE instead of asserted.
    *
    * Why there is no `compact()` here while every append-layout sibling
    * (IvfIndex, InvertedIndex, QueryStore, NgramLm) carries one: those
    * layouts grow by APPENDING part-files into live directories, so
    * steady-state mutation accretes files until a compactor folds them.
    * This store's mutations ([[rewriteBuckets]]) instead READ the whole
    * touched bucket, transform it, and atomically SWAP a freshly
    * written directory into place — every mutation IS a compaction of
    * the buckets it touches, so per-bucket file count is bounded by the
    * writer's partitioning of one bucket's rows (one file per touched
    * bucket under the staged single-partition writes the mutations use)
    * and never grows with mutation count. A sustained imbalance here
    * means bucket skew (one post_id hash bucket outgrowing the rest),
    * answered by re-bucketing into a new store, not by compaction.
    * Recovers crashed swaps first, like every sibling stats call — a
    * listing taken mid-crash-window would count a hidden backup's
    * absence as an empty bucket. */
  def fileStats(): DataFrame = {
    recoverAll()
    import spark.implicits._
    val rows = Option(fs.listStatus(new Path(path))).toSeq.flatten
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map { s =>
        (s.getPath.getName.stripPrefix("bucket=").toInt,
          fs.listStatus(s.getPath).count(_.getPath.getName.startsWith("part-")))
      }
    rows.toDF("bucket", "n_files").orderBy(col("bucket"))
  }

  /** Consistent on-disk SNAPSHOT of the whole store — bucket
    * directories and the prefix-dims meta (the
    * [[graft.sources.InvertedIndex.snapshot]] surface on the primary
    * embedding table, completing backup coverage across every
    * persisted layout): [[recoverAll]] quiesces the two-rename swaps
    * and [[vacuum]] drops the hidden mutation debris first (debris is
    * space, not state — a snapshot should not ship it), then the tree
    * copies byte-faithfully. Restore is free by construction — open
    * the copy (`new EmbeddingStore(spark, target)`) or copy it back.
    * Crash protocol: hidden `.snapstaging` sibling + rename — the
    * target either doesn't exist or is complete; debris never blocks
    * a retry. */
  def snapshot(targetPath: String): Unit = {
    recoverAll()
    vacuum()
    val dst = new Path(targetPath)
    require(!fs.exists(dst), s"snapshot target $targetPath already exists")
    val staging = new Path(dst.getParent, s".${dst.getName}.snapstaging")
    fs.delete(staging, true) // a crashed prior attempt's debris
    if (!graft.util.TreeCopy.copy(fs, new Path(path), staging,
        spark.sparkContext.hadoopConfiguration)) // file-parallel (r22)
      sys.error(s"snapshot copy to $staging failed")
    if (!fs.rename(staging, dst))
      sys.error(s"could not publish snapshot $staging -> $targetPath")
  }

  /** Bulk load: derive columns, assign ids, bucket, write. */
  def bulkLoad(raw: DataFrame): Unit = {
    val df = assignIds(withDerived(raw))
      .withColumn("bucket", bucketOf(col("post_id")))
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    effectivePrefixDims.foreach(writeMeta)
  }

  /** Materialize a mutation set to a staging dir inside the store before
    * rewriting buckets: the rewrite loop swaps the very files a lazy plan
    * would re-read, so the update set must be pinned down first. (This is
    * also what bounds memory: the staged set streams from disk per bucket,
    * never through the driver.) */
  private def writeStaged(df: DataFrame)(use: DataFrame => Unit): Unit = {
    val staging = s"$path/.staging"
    df.write.mode("overwrite").parquet(staging)
    try use(spark.read.parquet(staging))
    finally fs.delete(new Path(staging), true)
  }

  /** Rewrite only the given buckets: read bucket dir, transform, write to
    * temp, atomic swap. The untouched (numBuckets - |buckets|) directories
    * are never read or written — at 100 TB that's the difference between a
    * point update and a full-table rewrite.
    *
    * The rewrite coalesces to ONE file per bucket: a bucket is the unit
    * the numBuckets sizing contract keeps single-task-sized (point
    * lookups read it whole), so the union/join feeding the rewrite runs
    * fine in one partition, and the swap then IS a compaction — file
    * count per touched bucket is exactly 1 after any mutation, never a
    * function of mutation history ([[fileStats]] makes this checkable). */
  private def rewriteBuckets(buckets: Set[Int])(f: (Int, DataFrame) => DataFrame): Unit = {
    buckets.foreach { b =>
      val dir = s"$path/bucket=$b"
      recoverSwap(new Path(dir))
      val cur =
        if (fs.exists(new Path(dir))) spark.read.parquet(dir)
        else read().filter(lit(false)).drop("bucket")
      val out = f(b, cur)
      val tmp = s"$path/.tmp_bucket_$b"
      out.coalesce(1).write.mode("overwrite").parquet(tmp)
      atomicSwap(new Path(tmp), new Path(dir))
    }
    // persist the prefix setting on stores that predate it (bulkLoad wrote
    // it for fresh stores) so LATER handles without the parameter keep
    // deriving the column instead of splitting the schema
    effectivePrefixDims.filter(_ => !fs.exists(metaPath)).foreach(writeMeta)
  }

  /** Dot-prefixed backup path: hidden files/dirs are skipped by Spark's
    * file listing and partition discovery, so a crash mid-swap can never
    * surface BOTH old and new rows (or a `bucket=N.bak` partition value)
    * to readers. */
  private def bakPath(dst: Path): Path = new Path(dst.getParent, "." + dst.getName + ".bak")

  /** Sweep the WHOLE store for hidden swap backups left by a crashed
    * mutation and restore them eagerly. Runs at the top of [[read]] — i.e.
    * before ANY consumer (including upsert/insertAll, which compute maxId
    * and the existing-key join from read()) can observe the store. Without
    * the sweep, a bucket hidden in a `.bak` would make its keys look new to
    * the next upsert: id churn, lost created_at, and fresh ids colliding
    * with the hidden bucket's ids store-wide. One listStatus of the store
    * root per call — a single NameNode/S3 LIST, negligible next to the
    * parquet footer reads that follow. */
  private def recoverAll(): Unit = {
    val matches = Option(fs.globStatus(new Path(path, ".bucket=*.bak")))
    matches.toSeq.flatten.foreach { st =>
      val name = st.getPath.getName // ".bucket=N.bak"
      val dst = new Path(st.getPath.getParent, name.stripPrefix(".").stripSuffix(".bak"))
      recoverSwap(dst)
    }
  }

  /** Crash recovery for the two-rename swap: if a previous mutation died
    * between its renames, the live dir is missing and the hidden backup
    * holds the pre-mutation rows — restore it before proceeding. (A crash
    * AFTER the second rename leaves a stale hidden backup: deleted here.) */
  private def recoverSwap(dst: Path): Unit = {
    val bak = bakPath(dst)
    if (fs.exists(bak)) {
      if (!fs.exists(dst)) {
        if (!fs.rename(bak, dst))
          throw new java.io.IOException(s"cannot recover $dst from $bak")
      } else fs.delete(bak, true)
    }
  }

  /** Swap `tmp` into place via the Hadoop FileSystem API (HDFS/S3A/local —
    * not java.nio, which only works on a local disk). Two renames, not one
    * atomic op; the hidden backup + [[recoverSwap]] close the crash
    * window: at every instant readers see either only-old or only-new.
    *
    * Atomicity assumption, stated once for the engine's whole
    * two-rename/marker family: each `rename` is assumed to be an ATOMIC
    * O(1) metadata operation that either fully happens or not at all —
    * true on HDFS and POSIX local filesystems. On an object store
    * without atomic rename (plain S3), `FileSystem.rename` degrades to
    * copy-then-delete: correctness survives (recovery re-walks the
    * state-checked steps) but a crash mid-copy can expose a partially
    * copied directory to the recovery scan, and the O(1)-metadata cost
    * model breaks — on such stores the commit primitive should be a
    * manifest/pointer flip (the [[graft.sources.NgramLm]] versioned-
    * pointer pattern) rather than directory renames. */
  private def atomicSwap(tmp: Path, dst: Path): Unit = {
    val bak = bakPath(dst)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst) && !fs.rename(dst, bak))
      throw new java.io.IOException(s"cannot back up $dst")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"cannot swap $tmp into $dst")
    if (fs.exists(bak)) fs.delete(bak, true)
  }
}
