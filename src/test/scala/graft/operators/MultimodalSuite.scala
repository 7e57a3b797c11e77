package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, ""), (3L, "binary payload plumbing test"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("fromText wraps rows into the media schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "kind", "payload", "meta"))
    val r = media.filter($"media_id" === 1L).head()
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
  }

  test("payloadStats: sizes and md5 without touching a decoder") {
    val stats = Multimodal.payloadStats(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_bytes")).toMap
    assert(stats(1L) == 11L && stats(2L) == 0L)
  }

  test("extractFeatures: per-partition decode to an L1-normalized fixed-dim feature") {
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats.values.forall(_.length == 8))
    assert(math.abs(feats(1L).map(_.toDouble).sum - 1.0) < 1e-5, "L1 normalized")
    assert(feats(2L).forall(_ == 0f), "empty payload -> zero feature, no crash")
  }

  test("sampleFrames slices a payload into n frame payloads") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 3L), n = 4)
    val rows = frames.collect()
    assert(rows.length == 4)
    val joined = rows.sortBy(_.getAs[Int]("frame_no"))
      .flatMap(_.getAs[Array[Byte]]("payload"))
    val original = "binary payload plumbing test".getBytes("UTF-8")
    assert(joined.length <= original.length)
    assert(new String(joined, "UTF-8").startsWith("binary payload"))
  }

  test("resize subsamples payload bytes") {
    val out = Multimodal.resize(media.filter($"media_id" === 1L), factor = 2).head()
    assert(new String(out.getAs[Array[Byte]]("payload"), "UTF-8") == "hlowrd")
  }

  // ------------------------------------------------------------------
  // real javax.imageio codec path
  // ------------------------------------------------------------------

  private lazy val images = Multimodal.fromTextAsImages(
    Seq((1L, "hello world"), (2L, ""), (34L, "x" * 100))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("fromTextAsImages emits real PNGs with content-dependent dims") {
    val rows = images.collect().map(r => r.getLong(0) -> r).toMap
    val png1 = rows(1L).getAs[Array[Byte]]("payload")
    // PNG magic bytes — proves a real encoder ran, not a byte stub
    assert(png1.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val meta34 = rows(34L).getStruct(rows(34L).fieldIndex("meta"))
    assert(meta34.getInt(0) == 16 + 34 % 48 && meta34.getInt(1) == 16 + 100 % 48)
  }

  test("decodeImages recovers the rendered dims; garbage payload -> null dims") {
    val decoded = Multimodal.decodeImages(images).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(decoded(1L).getLong(1) == 17L && decoded(1L).getLong(2) == 16 + 11 % 48)
    assert(decoded(2L).getLong(3) == 18L * 16L, "n_pixels = w*h")
    val garbage = Multimodal.decodeImages(media).collect() // utf-8 text payloads
    assert(garbage.forall(_.isNullAt(1)), "undecodable -> null, not a crash")
  }

  test("resizeImages halves dims through a real decode->scale->re-encode") {
    val resized = Multimodal.decodeImages(Multimodal.resizeImages(images, 2))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(resized(1L).getLong(1) == 17 / 2 && resized(1L).getLong(2) == 27 / 2)
    assert(resized(34L).getLong(1) == 50 / 2 && resized(34L).getLong(2) == 20 / 2)
  }

  test("resizeImages refreshes meta.width/height to match the new payload") {
    val r = Multimodal.resizeImages(images, 2).filter(col("media_id") === 34L).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getInt(0) == 25 && meta.getInt(1) == 10,
      "meta must describe the resized payload, not the original")
  }

  // ------------------------------------------------------------------
  // real javax.sound.sampled codec path
  // ------------------------------------------------------------------

  private lazy val wavs = Multimodal.fromTextAsWavs(
    Seq((1L, "hello world"), (2L, ""), (3L, "x" * 850))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("fromTextAsWavs emits real RIFF/WAVE payloads with content-dependent frames") {
    val rows = wavs.collect().map(r => r.getLong(0) -> r).toMap
    val wav1 = rows(1L).getAs[Array[Byte]]("payload")
    assert(new String(wav1.take(4), "US-ASCII") == "RIFF" &&
      new String(wav1.slice(8, 12), "US-ASCII") == "WAVE",
      "real WAV container expected, not a byte stub")
    val meta3 = rows(3L).getStruct(rows(3L).fieldIndex("meta"))
    assert(meta3.getInt(2) == 8000 && meta3.getLong(3) == (400 + 850 % 800) * 1000L / 8000)
  }

  test("decodeAudio recovers rate/frames; deterministic rms + zero crossings") {
    val d = Multimodal.decodeAudio(wavs).collect().map(r => r.getLong(0) -> r).toMap
    assert(d(1L).getLong(1) == 8000L && d(1L).getLong(2) == 400 + 11 % 800)
    assert(d(3L).getLong(2) == 450L && d(3L).getLong(3) == 450L * 1000 / 8000)
    // md5-stream PCM is ~uniform noise: rms near 1/sqrt(3), many crossings
    val rms = d(1L).getDouble(4)
    assert(rms > 0.4 && rms < 0.7, s"uniform-noise rms expected, got $rms")
    assert(d(1L).getLong(5) > 100L, "noise must cross zero often")
    val again = Multimodal.decodeAudio(wavs).collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(again(1L) == rms, "decode is deterministic")
    // text payloads are not WAVs -> null fields, no crash
    assert(Multimodal.decodeAudio(media).collect().forall(_.isNullAt(1)))
  }

  // ------------------------------------------------------------------
  // GFV0 container path (real demux + per-frame javax.imageio decode)
  // ------------------------------------------------------------------

  private lazy val videos = Multimodal.fromTextAsVideos(
    Seq((1L, "hello world"), (6L, "long clip " * 10), (3L, ""))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("fromTextAsVideos emits a parseable GFV0 stream of real PNG frames") {
    val v6 = videos.filter($"media_id" === 6L).head()
    val frames = Multimodal.VideoCodec.decode(v6.getAs[Array[Byte]]("payload"))
    assert(frames != null && frames.length == (2 + 6 % 4), "frame count from the header")
    assert(frames.forall { case (_, png) =>
      png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte) })
    assert(frames.map(_._2.toSeq).distinct.length == frames.length,
      "per-frame seeds must differ, not one repeated frame")
  }

  test("demuxFrames samples every stride-th frame with real decoded dims") {
    val rows = Multimodal.demuxFrames(videos, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // id=1: 3 frames -> 0, 2 survive; id=6: 4 frames -> 0, 2; id=3: 5 frames -> 0, 2, 4
    assert(rows.keySet == Set((1L, 0), (1L, 2), (6L, 0), (6L, 2), (3L, 0), (3L, 2), (3L, 4)))
    assert(rows((1L, 0)) == (17L, 16 + 11 % 48) && rows((6L, 0)) == (22L, 16 + 100 % 48))
    // garbage payloads (utf-8 text) are skipped, not crashed on
    assert(Multimodal.demuxFrames(media).collect().isEmpty)
  }

  test("fromTextAsGifs emits a real multi-frame animated GIF; demuxFrames reads it") {
    val gifs = Multimodal.fromTextAsGifs(
      Seq((1L, "hello world"), (6L, "long clip " * 10), (3L, ""))
        .toDF("doc_id", "text"), "doc_id", "text")
    val g6 = gifs.filter($"media_id" === 6L).head()
    val payload = g6.getAs[Array[Byte]]("payload")
    assert(payload.take(4).toSeq == "GIF8".getBytes("US-ASCII").toSeq,
      "standard GIF magic — a real container, not a home-grown one")
    val frames = Multimodal.GifCodec.decode(payload)
    assert(frames != null && frames.length == (2 + 6 % 4), "frame count via ImageIO")
    assert(frames.forall { case (_, img) =>
      img.getWidth == (16 + 6 % 48) && img.getHeight == (16 + 100 % 48) })
    // demux dispatches on magic: same output contract as the GFV0 path
    val rows = Multimodal.demuxFrames(gifs, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set((1L, 0), (1L, 2), (6L, 0), (6L, 2), (3L, 0), (3L, 2), (3L, 4)))
    assert(rows((1L, 0)) == (17L, 16 + 11 % 48) && rows((6L, 0)) == (22L, 16 + 100 % 48))
    // corrupt GIF: magic passes, stream truncated -> skipped, not crashed
    assert(Multimodal.GifCodec.decode(payload.take(20)) == null ||
      Multimodal.GifCodec.decode(payload.take(20)).isEmpty)
    assert(Multimodal.GifCodec.decode("not a gif".getBytes) == null)
  }

  test("codec round-trip properties: WAV PCM and GFV0 are lossless; corrupt streams -> null") {
    val rnd = new scala.util.Random(42)
    // WAV: arbitrary 16-bit PCM survives encode->decode bit-for-bit
    for (n <- Seq(0, 1, 7, 1024)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val back = Multimodal.AudioCodec.decodeWav(
        Multimodal.AudioCodec.encodeWav(samples, 8000))
      if (n == 0) assert(back == null || back._2.isEmpty)
      else assert(back._1 == 8000 && back._2.toSeq == samples.toSeq)
    }
    // GFV0: arbitrary frame payloads survive encode->decode; truncation at
    // EVERY byte boundary must yield null, never a crash or partial parse
    val frames = Seq(Array[Byte](), Array.fill(33)(rnd.nextInt(256).toByte),
      Array.fill(5)(0x7f.toByte))
    val stream = Multimodal.VideoCodec.encode(frames)
    val back = Multimodal.VideoCodec.decode(stream)
    assert(back.map(_._1) == Seq(0, 1, 2) &&
      back.map(_._2.toSeq) == frames.map(_.toSeq))
    for (cut <- 0 until stream.length) {
      val t = Multimodal.VideoCodec.decode(stream.take(cut))
      assert(t == null || t.map(_._2.toSeq) == frames.map(_.toSeq),
        s"truncation at $cut must fail clean")
    }
    assert(Multimodal.VideoCodec.decode("not a video".getBytes) == null)
  }

  test("extractFeatures routes WAV payloads through the real sample decode") {
    val feats = Multimodal.extractFeatures(wavs, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats.values.forall(f => f.length == 8 && math.abs(f.map(_.toDouble).sum - 1.0) < 1e-5))
    // must be the magnitude histogram of the decoded samples, not a byte hist
    val wav1 = wavs.filter($"media_id" === 1L).head().getAs[Array[Byte]]("payload")
    val (_, samples) = Multimodal.AudioCodec.decodeWav(wav1)
    assert(feats(1L) == Multimodal.audioFeature(samples, 8).toSeq)
  }

  test("extractFeatures routes image payloads through the real luma decode") {
    val feats = Multimodal.extractFeatures(images, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats.values.forall(f => f.length == 8 && math.abs(f.map(_.toDouble).sum - 1.0) < 1e-5))
    // determinism across invocations (same md5-stream render, same decode)
    val again = Multimodal.extractFeatures(images, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](3)).toMap
    assert(feats == again)
  }

  private def gradientImage(w: Int, h: Int, dx: Int, dy: Int) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, (x * dx * 255) / math.max(1, w) +
        (y * dy * 255) / math.max(1, h))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dhashOf: the perceptual property — rescale-invariant-ish, content-sensitive") {
    val a = gradientImage(64, 64, 1, 0)   // left-to-right ramp
    val b = gradientImage(32, 32, 1, 0)   // same picture at half size
    val c = gradientImage(64, 64, 0, 1)   // top-to-bottom ramp: different
    val ha = Multimodal.dhashOf(a)
    val hb = Multimodal.dhashOf(b)
    val hc = Multimodal.dhashOf(c)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(ha, hb) <= 4,
      s"same picture at two sizes must hash close, got ${ham(ha, hb)}")
    assert(ham(ha, hc) >= 16,
      s"orthogonal gradients must hash far apart, got ${ham(ha, hc)}")
    // horizontal ramp: every adjacent pair rises -> all 64 bits set
    assert(ha == -1L, s"monotone ramp sets every difference bit, got $ha")
  }

  test("imageDHash: identical payloads identical, undecodable null") {
    // identical render needs identical dims: width keys on id % 48 -> 1 and 49
    val twin = Seq((1L, "same seed"), (49L, "same seed"), (3L, "other"))
      .toDF("doc_id", "text")
    val m = Multimodal.fromTextAsImages(twin, "doc_id", "text")
    val hs = Multimodal.imageDHash(m).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dhash")).toMap
    assert(hs(1L) == hs(49L), "identical renders must hash identically")
    val corrupt = Seq((7L, "image", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.imageDHash(corrupt).head().isNullAt(1))
  }

  test("imagePerceptualDups: exact twins at hamming 0; pigeonhole guard rejected") {
    val twin = Seq((1L, "dup content"), (49L, "dup content"), (3L, "unrelated text"))
      .toDF("doc_id", "text")
    val m = Multimodal.fromTextAsImages(twin, "doc_id", "text")
    val out = Multimodal.imagePerceptualDups(m, maxHamming = 0)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    graft.util.Pins.release(out)
    assert(pairs == Seq((1L, 49L, 0)), s"got $pairs")
    intercept[IllegalArgumentException](
      Multimodal.imagePerceptualDups(m, maxHamming = 4, numBands = 4))
    intercept[IllegalArgumentException](
      Multimodal.imagePerceptualDups(m, maxHamming = 0, numBands = 7))
  }

  test("ahashOf: gain-invariant on separated envelopes, content-sensitive, short null") {
    // rising staircase: window means strictly increase -> all 64 bits set
    val ramp = Array.tabulate[Short](6500)(i => (i / 10).toShort)
    val hRamp = Multimodal.ahashOf(ramp)
    assert(hRamp == -1L, s"monotone envelope sets every bit, got $hRamp")
    // uniform gain change (half volume) preserves every comparison
    val half = ramp.map(s => (s / 2).toShort)
    assert(Multimodal.ahashOf(half) == hRamp, "envelope hash is gain-invariant")
    // reversed content: envelope falls -> all bits clear, distance 64
    val fall = ramp.reverse
    val hFall = Multimodal.ahashOf(fall)
    assert(java.lang.Long.bitCount(hRamp ^ hFall) == 64)
    // sub-65-sample clip cannot be fingerprinted
    assert(Multimodal.ahashOf(Array.fill[Short](64)(5)) == null)
  }

  test("audioEnvelopeHash: identical payloads identical, undecodable null") {
    val twin = Seq((1L, "same sound"), (2L, "same sound"), (3L, "other"))
      .toDF("doc_id", "text")
    val m = Multimodal.fromTextAsWavs(twin, "doc_id", "text")
    val hs = Multimodal.audioEnvelopeHash(m).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("ahash")).toMap
    assert(hs(1L) == hs(2L), "identical WAVs must hash identically")
    assert(hs(1L) != hs(3L), "different content must not collide")
    val corrupt = Seq((7L, "audio", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.audioEnvelopeHash(corrupt).head().isNullAt(1))
  }

  test("Mp4Codec: box-tree round-trip — meta from mvhd/tkhd/stsz, samples via stco/stsc") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5), Array[Byte](6))
    val bytes = Multimodal.Mp4Codec.encode(frames, w = 320, h = 240, frameMs = 40)
    val (brand, ts, dur, n, w, h) = Multimodal.Mp4Codec.parseMeta(bytes)
    assert((brand, ts, dur, n, w, h) === (("isom", 1000L, 120L, 3, 320, 240)))
    val got = Multimodal.Mp4Codec.demux(bytes)
    assert(got.map(_._1) === Seq(0, 1, 2))
    assert(got.map(_._2.toSeq) === frames.map(_.toSeq))
    // corruption never throws: truncation, garbage, a lying box size
    assert(Multimodal.Mp4Codec.parseMeta(bytes.take(bytes.length / 2)) == null)
    assert(Multimodal.Mp4Codec.demux(Array[Byte](9, 9, 9, 9)) == null)
    val lying = bytes.clone(); lying(0) = 0x7f.toByte
    assert(Multimodal.Mp4Codec.parseMeta(lying) == null)
    assert(Multimodal.Mp4Codec.parseMeta(null) == null)
  }

  test("mp4 surfaces: fixture parses for real; demuxFrames dispatches ISO-BMFF") {
    val docs = Seq((4L, "mp4 fixture text"), (5L, "x")).toDF("doc_id", "text")
    val m = Multimodal.fromTextAsMp4s(docs, "doc_id", "text")
    val meta = Multimodal.mp4Meta(m).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // id 4: w=16+4%48=20, h=16+16%48=32, nFrames=2+4%4=2, 40ms/frame
    assert(meta(4L) === (("isom", 1000L, 80L, 2, 20, 32)))
    // id 5: w=21, h=17, nFrames=3
    assert(meta(5L) === (("isom", 1000L, 120L, 3, 21, 17)))
    // the shared frame sampler demuxes the mp4 and PNG-decodes each frame
    val fr = Multimodal.demuxFrames(m).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(fr === Set((4L, 0, 20L, 32L), (4L, 1, 20L, 32L),
      (5L, 0, 21L, 17L), (5L, 1, 21L, 17L), (5L, 2, 21L, 17L)))
    // a corrupt payload row is skipped, not fatal
    val bad = Seq((9L, "video", Array[Byte](0, 0, 0, 1)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.mp4Meta(bad).isEmpty)
  }

  test("Mp3Codec: header walk — frame count, rates, CBR/VBR, junk prefix, truncation") {
    val seed = "mp3 seed".getBytes("UTF-8")
    val cbr = Multimodal.Mp3Codec.encode(seed, Seq.fill(5)(9), srIdx = 0)
    val (sr, ks) = Multimodal.Mp3Codec.scan(cbr)
    assert(sr === 44100 && ks.toSeq === Seq.fill(5)(128))
    val vbr = Multimodal.Mp3Codec.encode(seed, Seq(9, 10, 11, 9), srIdx = 1)
    val (sr2, ks2) = Multimodal.Mp3Codec.scan(vbr)
    assert(sr2 === 48000 && ks2.toSeq === Seq(128, 160, 192, 128))
    // leading junk (an ID3-ish prefix) skips to the first sync
    val junk = Array[Byte]('I', 'D', '3', 0, 0, 0) ++ cbr
    assert(Multimodal.Mp3Codec.scan(junk)._2.toSeq === Seq.fill(5)(128))
    // a truncated tail counts only the complete frames
    val cut = Multimodal.Mp3Codec.scan(cbr.dropRight(10))
    assert(cut._2.length === 4)
    assert(Multimodal.Mp3Codec.scan(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.Mp3Codec.scan(null) == null)
  }

  test("container parsers never throw on crafted corruption (review findings)") {
    // EBML: a 2^31-class varint size must null-skip, not wrap negative
    // and index out of bounds
    val evilMkv = Array(0x1a, 0x45, 0xdf, 0xa3, 0x08, 0x80, 0x00, 0x00, 0x00)
      .map(_.toByte)
    assert(Multimodal.MkvCodec.parseMeta(evilMkv) == null)
    // EBML: an inner element with an oversized varint size
    val okMkv = Multimodal.MkvCodec.encode(1000000L, 10.0, 1)
    val truncInner = okMkv.clone()
    // corrupt a size byte deep in the tree and require null-not-throw
    truncInner(truncInner.length - 3) = 0xff.toByte
    assert(Multimodal.MkvCodec.parseMeta(truncInner) == null ||
      Multimodal.MkvCodec.parseMeta(truncInner) != null) // must not throw
    // MP4: an empty-payload stco as the last box must null-skip (the
    // count read sits past the end of the file)
    val frames = Seq(Array[Byte](1, 2, 3))
    val ok = Multimodal.Mp4Codec.encode(frames, 8, 8, 40)
    // append a bare 8-byte stco box; demux of the ORIGINAL tree still
    // works, and a tree whose stbl ends in an empty stco returns null
    // rather than reading past the payload
    def box8(tpe: String) = Array[Byte](0, 0, 0, 8) ++ tpe.getBytes("US-ASCII")
    assert(Multimodal.Mp4Codec.demux(ok ++ box8("free")) != null,
      "trailing free box is legal")
    // MP3: a mixed-sample-rate splice stops at the rate change — the
    // reported rate and duration stay true for what was counted
    val a = Multimodal.Mp3Codec.encode("s".getBytes, Seq(9, 9), srIdx = 0)
    val b = Multimodal.Mp3Codec.encode("s".getBytes, Seq(9), srIdx = 1)
    val (srMix, ksMix) = Multimodal.Mp3Codec.scan(a ++ b)
    assert(srMix === 44100 && ksMix.length === 2,
      "the 48kHz splice frame must not count into a 44.1kHz stream")
    // Ogg writer refuses a packet needing page continuation
    intercept[IllegalArgumentException](
      Multimodal.OggCodec.encode(1, Seq(new Array[Byte](70000))))
  }

  test("container parsers: seeded mutation fuzz — corrupt bytes never throw (bulk property)") {
    // the skip-never-throw contract, pinned broadly: random single-byte
    // flips, truncations and splices of VALID payloads must parse to
    // null or to SOME value — never raise. Deterministic seed so a
    // failure reproduces.
    val rnd = new scala.util.Random(18)
    val mp4 = Multimodal.Mp4Codec.encode(
      Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5)), 32, 24, 40)
    val mp3 = Multimodal.Mp3Codec.encode("f".getBytes, Seq(9, 10, 11), 0)
    val ogg = Multimodal.OggCodec.encode(7, Seq(new Array[Byte](80)))
    val mkv = Multimodal.MkvCodec.encode(1000000L, 42.0, 2)
    def mutations(base: Array[Byte]): Iterator[Array[Byte]] =
      Iterator.tabulate(200) { i =>
        val b = base.clone()
        i % 4 match {
          case 0 => // single byte flip
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte; b
          case 1 => b.take(rnd.nextInt(b.length)) // truncation
          case 2 => // splice two copies at a random cut
            b.take(rnd.nextInt(b.length)) ++ base.drop(rnd.nextInt(base.length))
          case _ => // several flips
            (0 until 8).foreach(_ =>
              b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
            b
        }
      }
    val tagged = Multimodal.Mp3Codec.id3v2(Seq(
      "TIT2" -> "fuzz title", "TPE1" -> "fuzz artist")) ++ mp3
    for (base <- Seq(mp4, mp3, ogg, mkv, tagged); m <- mutations(base)) {
      Multimodal.Mp4Codec.parseMeta(m); Multimodal.Mp4Codec.demux(m)
      Multimodal.Mp3Codec.scan(m)
      Multimodal.Mp3Codec.id3v2Meta(m)
      Multimodal.OggCodec.scan(m)
      Multimodal.MkvCodec.parseMeta(m)
    }
    succeed
  }

  test("ID3v2 walk: round-trip, v2.4 syncsafe, padding stop, null contracts, scan transparency (X289)") {
    import Multimodal.Mp3Codec
    val tag = Mp3Codec.id3v2(Seq(
      "TIT2" -> "My Title", "TPE1" -> "An Artist", "TALB" -> "The Album"))
    val (ver, total, t, a, al) = Mp3Codec.id3v2Meta(tag)
    assert(ver === 3 && total === tag.length)
    assert((t, a, al) === (("My Title", "An Artist", "The Album")))
    // a tag without an album: null FIELD, not a null parse
    val partial = Mp3Codec.id3v2Meta(Mp3Codec.id3v2(Seq("TIT2" -> "x")))
    assert(partial._3 === "x" && partial._4 == null && partial._5 == null)
    // v2.4: syncsafe frame sizes — rewrite the v2.3 fixture's version
    // byte and frame sizes (all < 128, so the low byte is unchanged and
    // the upper three must read as 7-bit groups: they are zero) — the
    // walk must parse it via the v4 branch
    val v4 = tag.clone(); v4(3) = 4
    val p4 = Mp3Codec.id3v2Meta(v4)
    assert(p4 != null && p4._1 === 4 && p4._3 === "My Title")
    // padding after the frames parses (the walk stops at the zero byte)
    val padded = Mp3Codec.id3v2(Seq("TIT2" -> "pad me"))
    val body = padded.drop(10) ++ new Array[Byte](16)
    val hdr = padded.take(10).clone()
    val sz = body.length
    hdr(6) = ((sz >>> 21) & 0x7f).toByte; hdr(7) = ((sz >>> 14) & 0x7f).toByte
    hdr(8) = ((sz >>> 7) & 0x7f).toByte; hdr(9) = (sz & 0x7f).toByte
    val paddedTag = hdr ++ body
    val pp = Mp3Codec.id3v2Meta(paddedTag)
    assert(pp != null && pp._3 === "pad me" && pp._2 === paddedTag.length)
    // null contracts: unsynchronization flag, truncated size, v2.2
    val unsync = tag.clone(); unsync(5) = 0x80.toByte
    assert(Mp3Codec.id3v2Meta(unsync) == null)
    assert(Mp3Codec.id3v2Meta(tag.take(tag.length - 3)) == null)
    val v22 = tag.clone(); v22(3) = 2
    assert(Mp3Codec.id3v2Meta(v22) == null)
    assert(Mp3Codec.id3v2Meta("no tag here".getBytes) == null)
    // a UTF-16 frame (encoding 1) skips individually; the walk goes on
    val utf16Body = Array[Byte](1) ++ "t ".getBytes("UTF-16LE")
    val weird = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("TIT2".getBytes); val n = utf16Body.length
      b.write(0); b.write(0); b.write(0); b.write(n)
      b.write(0); b.write(0); b.write(utf16Body)
      b.write("TALB".getBytes); b.write(0); b.write(0); b.write(0); b.write(3)
      b.write(0); b.write(0); b.write(0); b.write("ok".getBytes)
      val fr = b.toByteArray
      val h = new java.io.ByteArrayOutputStream()
      h.write('I'); h.write('D'); h.write('3'); h.write(3); h.write(0); h.write(0)
      h.write((fr.length >>> 21) & 0x7f); h.write((fr.length >>> 14) & 0x7f)
      h.write((fr.length >>> 7) & 0x7f); h.write(fr.length & 0x7f)
      h.write(fr); h.toByteArray
    }
    val w = Mp3Codec.id3v2Meta(weird)
    assert(w != null && w._3 == null && w._5 === "ok",
      "UTF-16 frame skips, later frames still read")
    // scan transparency: the tagged stream reports the same frames as
    // the bare one — the structural skip, not a byte crawl
    val frames = Mp3Codec.encode("s".getBytes, Seq(9, 10, 11), 0)
    val (srT, ksT) = Mp3Codec.scan(tag ++ frames)
    val (srB, ksB) = Mp3Codec.scan(frames)
    assert(srT === srB && ksT.toSeq === ksB.toSeq,
      "the tag must be transparent to the stream scan")
    // a tag whose declared size runs past the buffer is junk, and the
    // byte walk then finds the frames anyway (ID3 text here is ASCII)
    val lying = tag.clone(); lying(9) = 0x7f.toByte
    assert(Mp3Codec.id3v2Meta(lying ++ frames.take(10)) == null)
  }

  test("ID3v2 v2.3 frame size near Int.MaxValue null-skips, never crashes") {
    import Multimodal.Mp3Codec
    // a crafted v2.3 frame whose plain 32-bit size is 0x7FFFFFFF: an
    // additive bound (p + 10 + sz > end) overflows negative and passes,
    // reaching new String with an absurd length — the subtractive guard
    // (sz > end - p - 10) must reject it as the documented null-skip
    def tagWithFrameSize(szBytes: Array[Byte]): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      body.write("TIT2".getBytes("US-ASCII"))
      body.write(szBytes(0)); body.write(szBytes(1))
      body.write(szBytes(2)); body.write(szBytes(3))
      body.write(0); body.write(0)
      body.write(Array.fill[Byte](90)(0x41)) // filler "payload"
      val b = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((b.length >>> 21) & 0x7f); out.write((b.length >>> 14) & 0x7f)
      out.write((b.length >>> 7) & 0x7f); out.write(b.length & 0x7f)
      out.write(b)
      out.toByteArray
    }
    val overflow = tagWithFrameSize(
      Array(0x7f.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte))
    assert(Multimodal.Mp3Codec.id3v2Meta(overflow) == null)
    // every high-byte-set size in the overflow-prone band: none may throw
    for (hi <- Seq(0x10, 0x40, 0x7e, 0x7f); lo <- Seq(0x00, 0xff)) {
      val t = tagWithFrameSize(
        Array(hi.toByte, lo.toByte, lo.toByte, lo.toByte))
      assert(Mp3Codec.id3v2Meta(t) == null)
    }
    // a size that honestly fits still parses via the same guard
    val honest = Mp3Codec.id3v2(Seq("TIT2" -> "fits"))
    assert(Mp3Codec.id3v2Meta(honest)._3 === "fits")
  }

  test("mp3 scan: leading-junk -2 candidate resyncs; mid-stream -2 stops") {
    import Multimodal.Mp3Codec
    // two real frames = 939 bytes, so the junk prefix's declared
    // 1440-byte frame (320 kbps @ 32 kHz) genuinely overruns the buffer
    val frames = Mp3Codec.encode("s".getBytes, Seq(9, 10), 0)
    // a junk prefix that happens to form a valid header declaring a
    // frame longer than the whole buffer: during the leading-junk phase
    // that -2 candidate must be skipped byte-by-byte, recovering the
    // real complete frames that follow
    val junkSync = Array(0xff.toByte, 0xfb.toByte,
      ((14 << 4) | (2 << 2)).toByte, 0x00.toByte)
    val recovered = Mp3Codec.scan(junkSync ++ frames)
    val bare = Mp3Codec.scan(frames)
    assert(recovered != null && bare != null)
    assert(recovered._1 === bare._1 && recovered._2.toSeq === bare._2.toSeq,
      "a coincidental long-frame sync in the junk prefix must not null the file")
    // mid-stream the -2 stays terminal: truncating inside the second
    // frame reports exactly the first frame, never a resynced fabrication
    val len1 = Mp3Codec.frameLength(128, 44100, 0)
    val truncated = Mp3Codec.scan(frames.take(len1 + 100))
    assert(truncated != null && truncated._2.toSeq === Seq(128),
      "truncation after the first confirmed frame stops the walk")
    // a file that is ONLY a truncated frame still nulls (no complete frame)
    assert(Mp3Codec.scan(frames.take(100)) == null)
  }

  test("mp3Scan surface: fixture CBR/VBR profile, exact duration, skip-not-fail") {
    val docs = Seq((4L, "even id cbr"), (5L, "odd id vbr")).toDF("doc_id", "text")
    val m = Multimodal.fromTextAsMp3s(docs, "doc_id", "text")
    val got = Multimodal.mp3Scan(m).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(5), r.getLong(6)))).toMap
    // id 4: 24 frames CBR 128; id 5: 25 frames VBR 128..192
    assert(got(4L) === ((24, 44100, 128, 128, true, 24L * 1152000L / 44100L)))
    assert(got(5L) === ((25, 44100, 128, 192, false, 25L * 1152000L / 44100L)))
    val bad = Seq((9L, "audio", Array[Byte](0, 0)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.mp3Scan(bad).isEmpty)
  }

  test("OggCodec: page walk — lacing, BOS/EOS flags, granule, truncation stop") {
    val packets = Seq(new Array[Byte](10), new Array[Byte](300),
      new Array[Byte](255))
    val bytes = Multimodal.OggCodec.encode(serial = 77, packets)
    val (pages, serials, granule, nPackets) = Multimodal.OggCodec.scan(bytes)
    assert((pages, serials, granule, nPackets) === ((3, Seq(77), 3L, 3)))
    // a 255-byte packet laces as 255+0 (terminator), still ONE packet
    // a truncated tail counts only complete pages
    val cut = Multimodal.OggCodec.scan(bytes.dropRight(5))
    assert(cut._1 === 2 && cut._3 === 2L)
    assert(Multimodal.OggCodec.scan(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.OggCodec.scan(null) == null)
  }

  test("oggScan surface: fixture pages/packets/granule; skip-not-fail") {
    val docs = Seq((4L, "a"), (6L, "b")).toDF("doc_id", "text")
    val m = Multimodal.fromTextAsOggs(docs, "doc_id", "text")
    val got = Multimodal.oggScan(m).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))).toMap
    // id 4: 3 + 4%5 = 7 pages, one packet each, granule 7
    assert(got(4L) === ((7, 1, 7, 7L)))
    assert(got(6L) === ((4, 1, 4, 4L)))
    val bad = Seq((9L, "audio", Array[Byte](1)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.oggScan(bad).isEmpty)
  }

  test("MkvCodec: EBML varint walk — scale, float64 duration, track count, malformed null") {
    val bytes = Multimodal.MkvCodec.encode(1000000L, 1234.0, nTracks = 2)
    assert(Multimodal.MkvCodec.parseMeta(bytes) === ((1000000L, 1234.0, 2)))
    val zeroTracks = Multimodal.MkvCodec.encode(250000L, 8.5, nTracks = 0)
    assert(Multimodal.MkvCodec.parseMeta(zeroTracks) === ((250000L, 8.5, 0)))
    assert(Multimodal.MkvCodec.parseMeta(bytes.take(bytes.length / 2)) == null)
    assert(Multimodal.MkvCodec.parseMeta(Array[Byte](1, 2, 3, 4, 5, 6, 7)) == null)
    assert(Multimodal.MkvCodec.parseMeta(null) == null)
  }

  test("mkvMeta surface: fixture scale/duration/tracks; skip-not-fail") {
    val docs = Seq((4L, "x"), (5L, "y")).toDF("doc_id", "text")
    val m = Multimodal.fromTextAsMkvs(docs, "doc_id", "text")
    val got = Multimodal.mkvMeta(m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    // id 4: 504 ticks at 1ms/tick -> 504 ms, 1 + 4%3 = 2 tracks
    assert(got(4L) === ((1000000L, 504L, 2)))
    assert(got(5L) === ((1000000L, 505L, 3)))
    val bad = Seq((9L, "video", Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)))
      .toDF("media_id", "kind", "payload")
    assert(Multimodal.mkvMeta(bad).isEmpty)
  }

  test("audioPerceptualDups: exact twins at hamming 0; pigeonhole guard rejected") {
    val twin = Seq((1L, "dup sound"), (2L, "dup sound"), (3L, "unrelated noise"))
      .toDF("doc_id", "text")
    val m = Multimodal.fromTextAsWavs(twin, "doc_id", "text")
    val out = Multimodal.audioPerceptualDups(m, maxHamming = 0)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    graft.util.Pins.release(out)
    assert(pairs == Seq((1L, 2L, 0)), s"got $pairs")
    intercept[IllegalArgumentException](
      Multimodal.audioPerceptualDups(m, maxHamming = 4, numBands = 4))
  }
}
