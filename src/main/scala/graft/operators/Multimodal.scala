package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample staged as per-partition batch
  * transforms (`mapPartitions` — the Scala analogue of `mapInPandas`:
  * iterator-of-batches in, iterator-of-batches out, so a real codec could
  * amortize model/codec init per partition, not per row).
  *
  * The actual media codecs are NOT in this container, so the decode kernels
  * are deterministic STUBS (clearly marked below): they derive fake
  * features from the payload bytes. Everything around them — schema,
  * encoders, partition sizing, batch iteration, null handling — is real and
  * is what matters for the 100 TB plumbing (payloads never pass through a
  * shuffle: all transforms are map-side; only extracted compact features
  * ever join or aggregate).
  */
object Multimodal {

  /** media payload schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Wrap any table into media rows (payload = utf-8 bytes of a text
    * column) — lets the binary plumbing run against the synthetic
    * `documents` table until real media lands. */
  def fromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(null).cast(LongType).as("duration_ms"),
        lit("raw").as("codec")).as("meta"))

  // ---------------------------------------------------------------------
  // STUB decode kernel. A real deployment replaces `decodeBytes` with an
  // actual codec (JNI/javacv/etc.) — the signature and the per-partition
  // batching around it do not change.
  // ---------------------------------------------------------------------

  /** STUB: "decode" a payload into a fixed-dim feature vector. Fake but
    * deterministic: byte histogram folded to `dim` float buckets,
    * L1-normalized. */
  private[operators] def decodeBytes(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) { out(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f; i += 1 }
    val total = payload.length.toFloat
    var j = 0
    while (j < dim) { out(j) /= total; j += 1 }
    out
  }

  /** Per-partition batch decode: payload -> compact feature, dropping the
    * heavy bytes before anything downstream shuffles. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model weights, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), r.getString(1),
          (if (payload == null) 0 else payload.length).toLong,
          decodeBytes(payload, dim))
      }
    }(enc)
  }

  /** STUB resize: for images, byte-subsample the payload to emulate a
    * thumbnail (every k-th byte). Real impl = decode, scale, re-encode. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(media.schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val thumb =
          if (payload == null) null
          else payload.grouped(factor).map(_.head).toArray
        Row.fromSeq(r.toSeq.updated(r.fieldIndex("payload"), thumb))
      }
    }(enc)
  }

  /** STUB frame-sample: slice a "video" payload into `n` frame payloads
    * (equal byte ranges). Real impl = container demux + keyframe pick. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val outSchema = StructType(mediaSchema.fields :+ StructField("frame_no", IntegerType, false))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        if (payload == null || payload.isEmpty) Iterator.empty
        else {
          val step = math.max(1, payload.length / n)
          val pIdx = r.fieldIndex("payload")
          (0 until math.min(n, payload.length)).iterator.map { f =>
            val frame = payload.slice(f * step, math.min((f + 1) * step, payload.length))
            Row.fromSeq(r.toSeq.updated(pIdx, frame) :+ f)
          }
        }
      }
    }(enc)
  }

  /** Payload-level metadata pass (no decode): sizes + md5 — cheap integrity
    * scan expressible in the oracle. */
  def payloadStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("kind"),
      length(col("payload")).cast(LongType).as("n_bytes"),
      md5(col("payload")).as("payload_md5"))
}
