package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document arriving on the ingest stream, already simhashed
  * (batch-side: [[graft.operators.Dedup.simhash64]]). */
final case class DocArrival(doc_id: Long, simhash: Long, at: Timestamp)

/** Near-dup verdict for one arrival: `dup_of` = the canonical doc this one
  * duplicates (None = novel), `hamming` = its distance to that canonical. */
final case class NearDupVerdict(doc_id: Long, dup_of: Option[Long],
    hamming: Option[Int], at: Timestamp)

/** Online NEAR-dup detection over a document stream — the streaming
  * complement of the batch MinHash/SimHash pipeline ([[graft.operators.Dedup]]):
  * each arriving doc is checked against recently-seen docs and flagged
  * within one micro-batch, instead of waiting for the nightly batch dedup.
  *
  * Sharding: docs are keyed by their simhash's top [[NearDupStream.BucketBits]]
  * bits. Two docs within hamming distance h of each other on 64 bits agree
  * on the 16-bit prefix unless one of the h flipped bits lands there
  * (≈ h·16/64 chance) — single-band LSH recall, traded deliberately for a
  * shuffle key that scales out: each bucket's state is independent, so the
  * state store partitions cleanly across executors. (The batch pipeline's
  * multi-band pass catches what this misses.)
  *
  * State per bucket: the newest [[NearDupStream.MaxBucketEntries]] CANONICAL
  * docs (duplicates are never added, so a dup chain collapses onto its first
  * arrival). Retention is enforced at BOTH granularities: individual
  * canonicals expire once the watermark passes their arrival + `retentionMs`
  * (so a busy bucket still honors the horizon), and a fully-idle bucket's
  * state is dropped by an EVENT-TIME timeout — state stays bounded on an
  * endless crawl, like [[IngestDedup]]'s watermarked exact-dedup.
  *
  * Determinism under replay: same-batch events are processed in
  * (at, doc_id) order, and among multiple in-threshold canonicals the
  * match with the smallest (hamming, doc_id) wins.
  */
object NearDupStream {
  val BucketBits = 16
  val MaxBucketEntries = 256

  /** One kept canonical: id + full simhash. */
  final case class Entry(id: Long, sim: Long, at: Long)
  final case class BucketState(entries: List[Entry], lastAt: Long)

  def bucketOf(simhash: Long): Long = simhash >>> (64 - BucketBits)

  /** `docs` must carry a watermark on `at`. Emits one verdict per arrival. */
  def detect(docs: Dataset[DocArrival], maxHamming: Int = 3,
      retentionMs: Long = 3600000L): Dataset[NearDupVerdict] = {
    require(maxHamming >= 0 && maxHamming < 64, s"bad maxHamming $maxHamming")
    implicit val stateEnc: org.apache.spark.sql.Encoder[BucketState] =
      Encoders.product[BucketState]
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: org.apache.spark.sql.Encoder[NearDupVerdict] =
      Encoders.product[NearDupVerdict]

    docs
      .groupByKey(d => bucketOf(d.simhash))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, arrivals: Iterator[DocArrival], state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // per-ENTRY retention, enforced on the deterministic watermark
            // clock: a canonical older than the horizon must not match even
            // if its bucket never idles long enough for the whole-bucket
            // timeout below (a re-crawl past retention is a new snapshot,
            // same contract as IngestDedup)
            val expireBefore = state.getCurrentWatermarkMs() - retentionMs
            var s = {
              val s0 = state.getOption.getOrElse(BucketState(Nil, 0L))
              s0.copy(entries = s0.entries.filter(_.at > expireBefore))
            }
            val out = Seq.newBuilder[NearDupVerdict]
            // NB the group (one bucket x one micro-batch) is buffered for
            // the deterministic sort; rows are 3 fixed-width fields, so
            // memory is bounded by the micro-batch size — callers should
            // pre-filter degenerate docs (empty text simhashes collide
            // into one hot bucket) and bound batches via the trigger
            arrivals.toSeq.sortBy(d => (d.at.getTime, d.doc_id)).foreach { d =>
              val best = s.entries
                .map(e => (java.lang.Long.bitCount(e.sim ^ d.simhash), e.id))
                .filter(_._1 <= maxHamming)
                .minOption
              out += NearDupVerdict(d.doc_id, best.map(_._2), best.map(_._1), d.at)
              if (best.isEmpty)
                // novel: becomes a canonical; cap the bucket FIFO (newest
                // kept — a hot bucket forgets its oldest canonicals rather
                // than growing without bound)
                s = BucketState(
                  (Entry(d.doc_id, d.simhash, d.at.getTime) :: s.entries)
                    .take(MaxBucketEntries),
                  math.max(s.lastAt, d.at.getTime))
              else s = s.copy(lastAt = math.max(s.lastAt, d.at.getTime))
            }
            state.update(s)
            // evict the whole bucket when event time passes last arrival +
            // retention; clamp above the watermark (setting a timeout at or
            // below it throws and kills the query during replay/backfill)
            state.setTimeoutTimestamp(
              math.max(s.lastAt + retentionMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
        })
  }
}
