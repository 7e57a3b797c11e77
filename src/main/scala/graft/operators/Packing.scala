package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Greedy contiguous sequence packing — the batch-prep step of an LLM
  * training pipeline: documents are laid end-to-end in a deterministic
  * order and cut into fixed-capacity token packs; a document's pack is
  * `floor(tokens_before / capacity)`.
  *
  * The prefix sum is NOT a global `Window.orderBy` (single-partition
  * scale-killer). Same scheme as [[graft.util.DenseIds]]: range-partition
  * on the order key, sort within partitions, then two passes — (1) one
  * token SUM per partition (a tiny driver-side array), (2) per-partition
  * scan that adds the partition's offset. No task ever holds more than
  * its own partition; the driver holds one long per partition.
  */
object Packing {

  /** Returns the input plus `tokens_before` (prefix sum of `tokenCountCol`
    * in `orderCol` order), `pack_id` (pack of the doc's first token) and
    * `pack_last` (pack of its last token; > pack_id means the doc spans a
    * pack boundary and needs splitting downstream).
    *
    * CONTRACT: `orderCol` must be a UNIQUE key and `tokenCountCol`
    * non-null. Ties in the order key would leave the relative order of the
    * tied rows to shuffle-fetch timing — their pack assignments would then
    * differ run to run, breaking reproducibility (the oracle can't catch
    * this: its queries order by a unique id).
    *
    * The pinned sorted layout lives as long as the returned frame: in a
    * long-lived session, `graft.util.Pins.release(result)` after the last
    * consumer has materialized (see [[graft.util.Pins]]). */
  def packAssignments(df: DataFrame, orderCol: String, tokenCountCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    // pin the sorted layout: both passes below consume it, and without the
    // checkpoint each would re-execute the upstream plan (tokenization +
    // range shuffle) in full — the double-execution shape dedupGroups'
    // edge pinning fixed
    val ordered = df.repartitionByRange(col(orderCol)).sortWithinPartitions(col(orderCol))
      .localCheckpoint(true)
    val tcIdx = ordered.schema.fieldIndex(tokenCountCol)
    val ordIdx = ordered.schema.fieldIndex(orderCol)
    // closure captures only ints/strings — touching the DataFrame inside a
    // task would throw CANNOT_INVOKE_IN_TRANSFORMATIONS
    def tokenCount(r: Row): Long = {
      val v = r.get(tcIdx)
      require(v != null, s"packAssignments: null $tokenCountCol " +
        s"(row ${r.get(ordIdx)}) — counts must be non-null")
      v.asInstanceOf[Number].longValue()
    }
    val base = ordered.rdd
    // pass 1: one token sum per partition
    val partSums = base
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(tokenCount).sum)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = ordered.schema
      .add(StructField("tokens_before", LongType, nullable = false))
      .add(StructField("pack_id", LongType, nullable = false))
      .add(StructField("pack_last", LongType, nullable = false))
    // pass 2: running sum within each partition, started at its offset
    val rows = base.mapPartitionsWithIndex { case (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val tc = tokenCount(r)
        val before = acc
        acc += tc
        val packLast = if (tc > 0) (before + tc - 1) / capacity else before / capacity
        Row.fromSeq(r.toSeq :+ before :+ before / capacity :+ packLast)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** The per-pack CUT LIST from [[packAssignments]]'s boundaries (X109):
    * one row per (document, pack it touches) with the doc-LOCAL token
    * range [tok_start, tok_end) that lands in that pack — what a data
    * loader actually consumes: `pack_last > pack_id` told it a doc spans
    * a boundary; this says exactly where to cut. Zero-token docs emit no
    * slices (nothing to pack).
    *
    * Invariants (suite-pinned): per doc, the slices tile [0, n_tokens)
    * exactly; per pack, slice lengths sum to `capacity` (except the final
    * pack's remainder). Pure integer arithmetic on the assignment row —
    * deterministic, oracle-checkable.
    *
    * Scale shape: NO new exchange — a per-row generate over the
    * assignment frame, fan-out bounded by packs-touched (n_tokens /
    * capacity + 1 rows per doc), all columns codegen arithmetic. */
  def packSlices(assignments: DataFrame, orderCol: String, tokenCountCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    assignments
      .filter(col(tokenCountCol) > 0)
      .select(col(orderCol), col(tokenCountCol), col("tokens_before"),
        explode(sequence(col("pack_id"), col("pack_last"))).as("__p"))
      .select(col(orderCol), col("__p").as("pack_id"),
        greatest(lit(0L), col("__p") * capacity - col("tokens_before")).as("tok_start"),
        least(col(tokenCountCol),
          (col("__p") + 1) * capacity - col("tokens_before")).as("tok_end"))
  }
}
