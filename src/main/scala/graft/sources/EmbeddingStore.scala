package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._

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
  *    (Catalyst column pruning; see SearchEngine stage separation).
  */
final class EmbeddingStore(spark: SparkSession, path: String, numBuckets: Int = 64) {
  import spark.implicits._

  private def bucketOf(c: org.apache.spark.sql.Column) = pmod(hash(c), lit(numBuckets))

  /** Derive the reference's materialized columns on a raw
    * `(post_id, sequence_no, vector, vector_type)` frame. */
  def withDerived(raw: DataFrame): DataFrame =
    raw
      .withColumn("vector", col("vector").cast(ArrayType(FloatType)))
      .withColumn("magnitude", vecMagnitude(col("vector")))
      .withColumn("normalized_vector", vecNormalize(col("vector")))
      .withColumn("binary_code", packSignBits(col("vector")))
      .withColumn("created_at", coalesce(col("created_at"), current_timestamp()))
      .withColumn("updated_at", current_timestamp())

  /** Assign `id`s at ingest: AUTO_INCREMENT (`src/VectorTable.php:470`) has
    * no distributed equivalent — ids are dense row numbers over the
    * insertion order, assigned once at bulk load. */
  def assignIds(df: DataFrame, startAt: Long = 1L): DataFrame = {
    val w = Window.orderBy(col("post_id"), col("sequence_no"))
    df.withColumn("id", row_number().over(w).cast(LongType) + lit(startAt - 1))
  }

  def read(): DataFrame = spark.read.parquet(path)

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

  /** S6 latest row per post — `max_by(struct, updated_at)` instead of
    * ORDER BY ... LIMIT 1 (`VectorTable.php:313-320`). */
  def latestUpdated(postId: Long): DataFrame = {
    val w = Window.partitionBy(col("post_id")).orderBy(col("updated_at").desc, col("id").desc)
    allForPost(postId).withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** S10 count. */
  def count(): Long = read().count()

  // ---- S7-S9: mutation (read -> transform -> atomic swap) ---------------

  /** S7 upsert: full-outer-merge by (post_id, sequence_no). Unlike the
    * reference's UPDATE — which forgets to refresh `magnitude`
    * (`VectorTable.php:361`, documented bug) — all derived columns are
    * recomputed. Only the touched bucket is rewritten. */
  def upsert(updates: DataFrame): Unit = {
    val prepared = withDerived(updates)
    val buckets = prepared.select(bucketOf(col("post_id")).as("b")).distinct()
      .as[Int].collect().toSet
    mergeBuckets(prepared, buckets)
  }

  /** S8 replace-all-per-key: delete post's rows then insert the new set
    * (`VectorTable.php:401-425` does DELETE + row-at-a-time inserts). */
  def insertAll(postId: Long, rows: DataFrame): Unit = {
    val prepared = withDerived(rows)
    val buckets = prepared.select(bucketOf(col("post_id")).as("b")).distinct()
      .as[Int].collect().toSet
    rewriteBuckets(buckets) { cur =>
      cur.filter(col("post_id") =!= postId)
        .unionByName(prepared.select(cur.columns.map(col).toSeq: _*), allowMissingColumns = true)
    }
  }

  /** S9 point delete (anti-join rewrite of the touched bucket). */
  def delete(id: Long): Unit = {
    val all = read()
    val buckets = all.filter(col("id") === id)
      .select(bucketOf(col("post_id")).as("b")).distinct().as[Int].collect().toSet
    rewriteBuckets(buckets)(_.filter(col("id") =!= id))
  }

  /** Bulk load: derive columns, assign ids, bucket, write. */
  def bulkLoad(raw: DataFrame): Unit = {
    val df = assignIds(withDerived(raw))
      .withColumn("bucket", bucketOf(col("post_id")))
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  private def mergeBuckets(prepared: DataFrame, buckets: Set[Int]): Unit =
    rewriteBuckets(buckets) { cur =>
      val newKeys = prepared.select(col("post_id").as("__np"), col("sequence_no").as("__ns")).distinct()
      val kept = cur.join(broadcast(newKeys),
        cur("post_id") === col("__np") && cur("sequence_no") === col("__ns"), "left_anti")
      val maxId = Option(read().agg(max(col("id"))).first().get(0)).fold(0L)(_.asInstanceOf[Long])
      val w = Window.orderBy(col("post_id"), col("sequence_no"))
      val withIds = prepared.withColumn("id",
        row_number().over(w).cast(LongType) + lit(maxId))
      kept.unionByName(withIds.select(kept.columns.map(col).toSeq: _*))
    }

  /** Rewrite only the given buckets: read bucket dirs, transform, write to
    * temp, atomic swap. The untouched (numBuckets - |buckets|) directories
    * are never read or written — at 100 TB that's the difference between a
    * point update and a full-table rewrite. */
  private def rewriteBuckets(buckets: Set[Int])(f: DataFrame => DataFrame): Unit = {
    buckets.foreach { b =>
      val dir = s"$path/bucket=$b"
      val cur =
        if (Files.exists(Paths.get(dir)))
          spark.read.parquet(dir)
        else read().filter(lit(false)).drop("bucket")
      val out = f(cur)
      val tmp = s"$path/.tmp_bucket_$b"
      out.write.mode("overwrite").parquet(tmp)
      atomicSwap(Paths.get(tmp), Paths.get(dir))
    }
  }

  private def atomicSwap(tmp: Path, dst: Path): Unit = {
    val bak = dst.resolveSibling(dst.getFileName.toString + ".bak")
    if (Files.exists(dst)) Files.move(dst, bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(bak)) deleteRecursively(bak)
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
