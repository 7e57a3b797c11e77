package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming exact-dedup for a continuous document ingest: fingerprint
  * each arriving doc (md5 of the whitespace/case-normalized text,
  * [[TextAnalysis.fingerprint]]) and emit ONE representative per
  * fingerprint inside the watermark horizon — the first micro-batch's
  * arrival wins across batches; within a single micro-batch the kept
  * row among simultaneous duplicates is an arbitrary (shuffle-order)
  * pick, as with any distributed dedup.
  *
  * `dropDuplicatesWithinWatermark` is the scale-correct primitive here:
  * plain `dropDuplicates` on a stream keeps every fingerprint ever seen
  * in the state store (unbounded growth — OOM on a crawl that never
  * ends), while the watermarked variant evicts fingerprints older than
  * the horizon. The contract a crawl ingest actually needs is exactly
  * that: crawlers re-fetch the same page within minutes, so near-in-time
  * duplicates are dropped, and a re-crawl months later is a legitimate
  * new snapshot.
  *
  * State is hash-partitioned by fingerprint (Spark shuffles on the dedup
  * key), so the dedup scales out with executors; the emitted frame keeps
  * the fingerprint column for downstream batch dedup joins.
  */
object IngestDedup {

  /** Deduplicate a streaming document frame by content fingerprint.
    *
    * @param docs       streaming frame with an event-time column
    * @param text       the document text column
    * @param tsCol      event-time column name (watermark anchor)
    * @param watermark  lateness horizon, e.g. "10 minutes" — also the
    *                   dedup-state retention bound
    * @param normalized key on [[TextAnalysis.normalizedFingerprint]]
    *                   (X127: digit-masked, punctuation-stripped) instead
    *                   of the raw fingerprint — collapses the crawl-noise
    *                   re-fetch class (rotating view counters, timestamps)
    *                   the raw key re-admits on every fetch; same state
    *                   shape, just a lossier key
    */
  def dedupStream(docs: DataFrame, text: Column, tsCol: String,
      watermark: String, normalized: Boolean = false): DataFrame = {
    require(!docs.columns.contains("fingerprint"),
      "dedupStream emits a 'fingerprint' column; rename the existing one first")
    val key = if (normalized) TextAnalysis.normalizedFingerprint(text)
      else TextAnalysis.fingerprint(text)
    docs
      .withColumn("fingerprint", key)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
  }
}
