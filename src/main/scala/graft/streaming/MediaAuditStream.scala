package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Multimodal

/** Streaming media audit (X281 — the container walks of
  * [[graft.operators.Multimodal]] applied to an ARRIVING payload
  * stream): classify each landing binary payload by its container
  * family and emit its no-decode metadata row — "what is this file,
  * how long, how many tracks/frames" at ingest time, before anything
  * expensive (sample decode, feature extraction, dedup) is scheduled
  * on it. The production shape: a crawl's media bucket lands
  * continuously, and the audit stream is what routes payloads to the
  * right downstream pipeline (and quarantines junk) without ever
  * opening a codec.
  *
  * Design: every parser ([[Multimodal.Mp4Codec]], [[Multimodal
  * .Mp3Codec]], [[Multimodal.OggCodec]], [[Multimodal.MkvCodec]]) is
  * a pure function of the payload bytes — no model, no reference
  * table — so the stream is a STATELESS per-row map: Append mode, no
  * watermark, no shuffle, payload bytes never leave the partition
  * (the engine-wide multimodal rule). Parity with the batch surfaces
  * is structural: the same codec objects run in both, so a payload
  * audits identically at ingest and in backfill (suite-pinned).
  *
  * Output per arriving row: (media_id, container, n_units, duration_ms)
  * where container ∈ mp4 | mp3 | ogg | mkv | unknown; n_units is the
  * family's natural count (mp4 samples, mp3 frames, ogg packets, mkv
  * tracks); unknown payloads keep the row (nulls) — the audit must
  * account for every arrival, junk included, or the quarantine rate
  * is invisible. */
object MediaAuditStream {

  /** Audit a (micro-)batch or stream frame of (media_id, payload) rows.
    * Works unchanged on a static frame (the batch-parity surface the
    * suite pins) and on a `readStream` source — the transform is
    * stateless, so Structured Streaming accepts it in Append mode. */
  def audit(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("container", StringType, nullable = false),
      StructField("n_units", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]]("payload")
        val mp4 = Multimodal.Mp4Codec.parseMeta(payload)
        if (mp4 != null) {
          val (_, ts, dur, n, _, _) = mp4
          Row(id, "mp4", n, Multimodal.Mp4Codec.durationMs(dur, ts))
        } else {
          val mkv = Multimodal.MkvCodec.parseMeta(payload)
          if (mkv != null) {
            val (scale, ticks, tracks) = mkv
            Row(id, "mkv", tracks, Multimodal.MkvCodec.durationMs(ticks, scale))
          } else {
            val ogg = Multimodal.OggCodec.scan(payload)
            if (ogg != null) {
              val (_, _, _, packets) = ogg
              // granule→ms needs the codec rate (stated on oggScan);
              // the audit reports the packet count and leaves duration
              // to the routed pipeline
              Row(id, "ogg", packets, null)
            } else {
              // classification is STRICT: the sync must sit at offset 0
              // (scan's junk-skip rule is right for scanning known-mp3s,
              // wrong as an is-this-an-mp3 test — a coincidental 0xFFFB
              // inside random bytes must not hide junk from quarantine)
              val mp3 = if (Multimodal.Mp3Codec.syncAt(payload, 0))
                Multimodal.Mp3Codec.scan(payload) else null
              if (mp3 != null) {
                val (sr, kbps) = mp3
                Row(id, "mp3", kbps.length,
                  Multimodal.Mp3Codec.durationMs(kbps.length, sr))
              } else Row(id, "unknown", null, null)
            }
          }
        }
      }
    }(enc)
  }
}
