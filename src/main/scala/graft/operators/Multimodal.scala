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
  * Codec reality, layer by layer: image (PNG/JPEG/BMP/GIF incl. animated)
  * and WAV audio decode for REAL through `javax.imageio` /
  * `javax.sound.sampled`; the MP4 CONTAINER parses for real at the byte
  * level ([[Mp4Codec]] — box tree, sample tables; container structure
  * needs no codec) as does the MP3 frame-header walk ([[Mp3Codec]] —
  * frame count/bitrate/duration without Layer-III decode). Only SAMPLE
  * decode for formats whose codecs the JDK lacks (h264, mp3 audio, ogg,
  * mkv) stays a deterministic STUB (clearly marked below), deriving fake
  * features from payload bytes. Everything around the kernels — schema,
  * encoders, partition sizing, batch iteration, null handling — is real and
  * is what matters for the 100 TB plumbing (payloads never pass through a
  * shuffle: all transforms are map-side; only extracted compact features
  * ever join or aggregate).
  */
object Multimodal {

  /** Real image codec (JDK `javax.imageio` — PNG/JPEG/BMP/GIF, no external
    * libs). Used by the image paths below; video demux stays a documented
    * stub (no container parser in the JDK). All methods are executor-side
    * and allocation-only (no display), safe under headless JVMs. */
  private[operators] object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    ImageIO.setUseCache(false) // keep executor decode off the disk cache

    /** Deterministic content-dependent render: pixel bytes are an md5
      * stream over (seed, blockNo) — same seed => same image, any JVM. */
    def render(seed: Array[Byte], w: Int, h: Int): BufferedImage = {
      val need = w * h * 3
      val px = new Array[Byte](need + 16)
      val md = java.security.MessageDigest.getInstance("MD5")
      var off = 0
      var block = 0
      while (off < need) {
        md.reset()
        md.update(seed)
        md.update(Array[Byte](
          (block >> 24).toByte, (block >> 16).toByte, (block >> 8).toByte, block.toByte))
        System.arraycopy(md.digest(), 0, px, off, 16)
        off += 16; block += 1
      }
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = java.lang.Byte.toUnsignedInt(px(i))
          val g = java.lang.Byte.toUnsignedInt(px(i + 1))
          val b = java.lang.Byte.toUnsignedInt(px(i + 2))
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          i += 3; x += 1
        }
        y += 1
      }
      img
    }

    def encode(img: BufferedImage, format: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream(img.getWidth * img.getHeight / 2 + 64)
      require(ImageIO.write(img, format, bos), s"no ImageIO writer for '$format'")
      bos.toByteArray
    }

    /** null on null/empty/undecodable payload. Catches NonFatal, not just
      * IOException: the JDK's built-in readers throw RuntimeExceptions
      * (IndexOutOfBounds/NegativeArraySize/IllegalArgument) on payloads
      * whose magic bytes pass but whose headers are corrupt — a 100 TB
      * scan must not die on one such file. */
    def decode(bytes: Array[Byte]): BufferedImage =
      if (bytes == null || bytes.length == 0) null
      else
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }

    /** Area-agnostic scale via Graphics2D (bilinear). */
    def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** Luma histogram, `dim` buckets, L1-normalized — the real-decode
      * counterpart of the byte-histogram stub (same output contract). */
    def lumaFeature(img: BufferedImage, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val w = img.getWidth
      val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // integer BT.601-ish luma, exact across JVMs
          val luma = (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
          out(math.min(luma * dim / 256, dim - 1)) += 1f
          x += 1
        }
        y += 1
      }
      val total = (w * h).toFloat
      var j = 0
      while (j < dim) { out(j) /= total; j += 1 }
      out
    }
  }

  /** Real audio codec (JDK `javax.sound.sampled` — WAV/PCM, no external
    * libs). Mono 16-bit little-endian PCM; deterministic render from an
    * md5 stream, real container decode through AudioSystem. Compressed
    * codecs (mp3/ogg) are not in the JDK and stay out of scope. */
  private[operators] object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def format(sampleRate: Int): AudioFormat =
      new AudioFormat(sampleRate.toFloat, 16, 1, true /* signed */, false /* LE */)

    /** Deterministic PCM render: 16-bit samples from an md5 stream over
      * (seed, blockNo) — same contract as ImageCodec.render. */
    def render(seed: Array[Byte], nFrames: Int): Array[Short] = {
      val out = new Array[Short](nFrames)
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      var block = 0
      while (i < nFrames) {
        md.reset()
        md.update(seed)
        md.update(Array[Byte](
          (block >> 24).toByte, (block >> 16).toByte, (block >> 8).toByte, block.toByte))
        val d = md.digest()
        var j = 0
        while (j < 8 && i < nFrames) {
          out(i) = (((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)).toShort
          i += 1; j += 1
        }
        block += 1
      }
      out
    }

    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), format(sampleRate), samples.length.toLong)
      val bos = new ByteArrayOutputStream(pcm.length + 64)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** (sampleRate, samples), or null on null/empty/undecodable payload. */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
      if (bytes == null || bytes.length == 0) return null
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) return null
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val out = new Array[Short](n)
        var i = 0
        if (fmt.isBigEndian)
          while (i < n) {
            out(i) = (((pcm(2 * i) & 0xff) << 8) | (pcm(2 * i + 1) & 0xff)).toShort; i += 1
          }
        else
          while (i < n) {
            out(i) = (((pcm(2 * i + 1) & 0xff) << 8) | (pcm(2 * i) & 0xff)).toShort; i += 1
          }
        (fmt.getSampleRate.toInt, out)
      } catch {
        // NonFatal, not just the declared exceptions: corrupt RIFF headers
        // can surface as RuntimeExceptions from the parser internals
        case scala.util.control.NonFatal(_) => null
      }
    }

    /** Root-mean-square amplitude normalized to [0,1]. */
    def rms(samples: Array[Short]): Double = {
      if (samples.isEmpty) return 0.0
      var acc = 0.0
      var i = 0
      while (i < samples.length) {
        val s = samples(i) / 32768.0
        acc += s * s; i += 1
      }
      math.sqrt(acc / samples.length)
    }

    /** Sign-change count — the classic cheap spectral-content proxy. */
    def zeroCrossings(samples: Array[Short]): Long = {
      var n = 0L
      var i = 1
      while (i < samples.length) {
        if ((samples(i - 1) < 0) != (samples(i) < 0)) n += 1
        i += 1
      }
      n
    }
  }

  /** Toy-but-real video container: `"GFV0"` magic, 4-byte BE frame count,
    * then per frame a 4-byte BE length + a PNG-encoded frame. The JDK has
    * no mp4/mkv demuxer, so this length-prefixed format stands in for the
    * container layer — but everything above it is real: the demux PARSES
    * the stream (no byte-range guessing) and every frame round-trips
    * through `javax.imageio`. */
  private[operators] object VideoCodec {
    import java.io.{ByteArrayOutputStream, DataOutputStream}

    val Magic: Array[Byte] = "GFV0".getBytes("US-ASCII")

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(frames.map(_.length + 4).sum + 8)
      val out = new DataOutputStream(bos)
      out.write(Magic)
      out.writeInt(frames.length)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      bos.toByteArray
    }

    /** Parsed frames as (frameNo, pngBytes), or null when the payload is
      * not a GFV0 stream or is truncated mid-frame. */
    def decode(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 8 || !bytes.startsWith(Magic)) return null
      val in = java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
      val n = in.getInt
      if (n < 0) return null
      val frames = Seq.newBuilder[(Int, Array[Byte])]
      var i = 0
      while (i < n) {
        if (in.remaining < 4) return null
        val len = in.getInt
        if (len < 0 || in.remaining < len) return null
        val f = new Array[Byte](len)
        in.get(f)
        frames += ((i, f))
        i += 1
      }
      frames.result()
    }
  }

  /** Minimal-but-REAL ISO-BMFF (MP4) muxer + demuxer — pure byte-level
    * BOX parsing, zero codec dependence. The earlier rounds' honest gap
    * ("the JDK has no mp4 demuxer") conflated two layers: the CONTAINER
    * (size+type box tree, sample tables) is plain binary structure any
    * JVM can parse, only the SAMPLE PAYLOAD needs a codec. This object
    * does the container layer for real: the muxer writes a structurally
    * valid `ftyp`+`mdat`+`moov` tree (mvhd/tkhd/mdhd/hdlr/vmhd/dinf +
    * the full stbl: stsd/stts/stsc/stsz/stco) and the demuxer WALKS THE
    * BOXES — mvhd for timescale/duration, tkhd for the 16.16 dims, stsz
    * sample sizes laid over stco/stsc chunk offsets to cut the exact
    * sample byte ranges out of mdat. Nothing is guessed from byte
    * ranges; a real mp4's metadata parses identically (its samples just
    * aren't PNG-decodable here — fixture samples are PNG, so the frame
    * path stays real-codec end-to-end via javax.imageio). Malformed or
    * truncated trees return null (a corrupt file must not kill a scan). */
  private[graft] object Mp4Codec {
    import java.io.ByteArrayOutputStream
    import java.nio.ByteBuffer

    private def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val size = 8L + parts.map(_.length.toLong).sum
      val bos = new ByteArrayOutputStream(size.toInt)
      bos.write(be32(size)); bos.write(tpe.getBytes("US-ASCII"))
      parts.foreach(bos.write)
      bos.toByteArray
    }

    /** Mux PNG frames into a valid single-track, single-chunk MP4 tree:
      * ftyp, mdat (samples back to back), moov with the full sample
      * table. `frameMs` is the per-sample duration at timescale 1000. */
    def encode(frames: Seq[Array[Byte]], w: Int, h: Int,
        frameMs: Int): Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
        "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII"))
      val mdat = box("mdat", frames: _*)
      val firstSample = ftyp.length + 8L // abs offset of mdat payload
      val n = frames.size
      val dur = n.toLong * frameMs
      def z(nBytes: Int) = new Array[Byte](nBytes)
      val matrix = be32(0x10000) ++ z(12) ++ be32(0x10000) ++ z(12) ++
        be32(0x40000000) // identity 3x3 in 16.16/2.30
      val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000),
        be32(dur), be32(0x10000), Array(1.toByte, 0.toByte), z(10),
        matrix, z(24), be32(2))
      val tkhd = box("tkhd", be32(7), be32(0), be32(0), be32(1), z(4),
        be32(dur), z(8), z(2), z(2), z(2), z(2), matrix,
        be32(w.toLong << 16), be32(h.toLong << 16))
      val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000),
        be32(dur), Array(0x55.toByte, 0xc4.toByte), z(2))
      val hdlr = box("hdlr", be32(0), be32(0),
        "vide".getBytes("US-ASCII"), z(12), z(1))
      val vmhd = box("vmhd", be32(1), z(8))
      val dinf = box("dinf", box("dref", be32(0), be32(1),
        box("url ", be32(1))))
      // generic 86-byte visual sample entry, format 'png '
      val entry = box("png ", z(6), Array(0.toByte, 1.toByte), z(16),
        Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte),
        Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte),
        be32(0x480000), be32(0x480000), z(4),
        Array(0.toByte, 1.toByte), z(32),
        Array(0.toByte, 24.toByte), Array(0xff.toByte, 0xff.toByte))
      val stsd = box("stsd", be32(0), be32(1), entry)
      val stts = box("stts", be32(0), be32(1), be32(n), be32(frameMs))
      val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
      val stsz = box("stsz", be32(0), be32(0), be32(n),
        frames.toArray.flatMap(f => be32(f.length)))
      val stco = box("stco", be32(0), be32(1), be32(firstSample))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      ftyp ++ mdat ++ moov
    }

    /** Child boxes of [from, to): (type, payloadStart, payloadEnd) — or
      * null on structural corruption (bad size, truncation). */
    private def children(bytes: Array[Byte], from: Int,
        to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var p = from
      while (p < to) {
        if (p + 8 > to) return null
        val size = ByteBuffer.wrap(bytes, p, 4).getInt.toLong & 0xffffffffL
        if (size < 8 || p + size > to) return null
        val tpe = new String(bytes, p + 4, 4, "US-ASCII")
        out += ((tpe, p + 8, (p + size).toInt))
        p = (p + size).toInt
      }
      out.result()
    }

    private def find(cs: Seq[(String, Int, Int)],
        tpe: String): Option[(Int, Int)] =
      Option(cs).flatMap(_.collectFirst { case (t, s, e) if t == tpe => (s, e) })

    /** Duration in ms from mvhd units — THE conversion every consumer
      * ([[Multimodal.mp4Meta]], [[graft.streaming.MediaAuditStream]])
      * shares, so the surfaces cannot drift. */
    def durationMs(durationUnits: Long, timescale: Long): Long =
      if (timescale > 0) durationUnits * 1000L / timescale else 0L

    /** (brand, timescale, durationUnits, nSamples, width, height) from
      * the box tree alone, or null when the payload is not a well-formed
      * single-video-track MP4. */
    def parseMeta(bytes: Array[Byte])
        : (String, Long, Long, Int, Int, Int) = {
      if (bytes == null || bytes.length < 16) return null
      val top = children(bytes, 0, bytes.length)
      if (top == null) return null
      val brand = find(top, "ftyp") match {
        case Some((s, e)) if e - s >= 4 => new String(bytes, s, 4, "US-ASCII")
        case _ => return null
      }
      val stbl = stblOf(bytes, top).getOrElse(return null)
      val (moovS, moovE) = find(top, "moov").getOrElse(return null)
      val moov = children(bytes, moovS, moovE)
      val (mvS, mvE) = find(moov, "mvhd").getOrElse(return null)
      if (mvE - mvS < 20) return null
      if (bytes(mvS) != 0) return null // only version 0 written/served
      val timescale = ByteBuffer.wrap(bytes, mvS + 12, 4).getInt.toLong
      val duration = ByteBuffer.wrap(bytes, mvS + 16, 4).getInt.toLong
      val (trakS, trakE) = find(moov, "trak").getOrElse(return null)
      val (tkS, tkE) = find(children(bytes, trakS, trakE), "tkhd")
        .getOrElse(return null)
      if (tkE - tkS < 84) return null
      // same guard as mvhd: a version-1 tkhd widens the create/modify
      // times by 8 bytes, so width/height live at +88/+92 — reading
      // +76/+80 there would emit garbage dims instead of null-skipping
      if (bytes(tkS) != 0) return null
      val w = ByteBuffer.wrap(bytes, tkS + 76, 4).getInt >>> 16
      val h = ByteBuffer.wrap(bytes, tkS + 80, 4).getInt >>> 16
      val sizes = sampleSizes(bytes, stbl).getOrElse(return null)
      (brand, timescale, duration, sizes.length, w, h)
    }

    private def stblOf(bytes: Array[Byte],
        top: Seq[(String, Int, Int)]): Option[(Int, Int)] =
      for {
        (moovS, moovE) <- find(top, "moov")
        (trakS, trakE) <- find(children(bytes, moovS, moovE), "trak")
        (mdiaS, mdiaE) <- find(children(bytes, trakS, trakE), "mdia")
        (minfS, minfE) <- find(children(bytes, mdiaS, mdiaE), "minf")
        stbl <- find(children(bytes, minfS, minfE), "stbl")
      } yield stbl

    private def sampleSizes(bytes: Array[Byte],
        stbl: (Int, Int)): Option[Array[Int]] = {
      val cs = children(bytes, stbl._1, stbl._2)
      find(cs, "stsz").flatMap { case (s, e) =>
        if (e - s < 12) None
        else {
          val fixed = ByteBuffer.wrap(bytes, s + 4, 4).getInt
          val n = ByteBuffer.wrap(bytes, s + 8, 4).getInt
          // a sample count beyond the file's byte length is garbage —
          // reject before allocating on it
          if (n < 0 || n > bytes.length) None
          else if (fixed != 0) Some(Array.fill(n)(fixed))
          else if (e - s < 12 + 4L * n) None
          else Some(Array.tabulate(n)(i =>
            ByteBuffer.wrap(bytes, s + 12 + 4 * i, 4).getInt))
        }
      }
    }

    /** Samples as (sampleNo, bytes) by laying stsz sizes over the
      * stco/stsc chunk map — the general walk, not a single-chunk
      * shortcut; null when the tree or any byte range is out of
      * bounds. */
    def demux(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
      if (bytes == null || bytes.length < 16) return null
      val top = children(bytes, 0, bytes.length)
      if (top == null || find(top, "ftyp").isEmpty) return null
      val stbl = stblOf(bytes, top).getOrElse(return null)
      val cs = children(bytes, stbl._1, stbl._2)
      val sizes = sampleSizes(bytes, stbl).getOrElse(return null)
      val stco = find(cs, "stco").getOrElse(return null)
      // length-check the fixed header BEFORE reading the entry count —
      // an empty-payload box must null-skip, not index out of bounds
      if (stco._2 - stco._1 < 8) return null
      val nChunks = ByteBuffer.wrap(bytes, stco._1 + 4, 4).getInt
      if (nChunks < 0 || stco._2 - stco._1 < 8 + 4L * nChunks) return null
      val offsets = Array.tabulate(nChunks)(i =>
        ByteBuffer.wrap(bytes, stco._1 + 8 + 4 * i, 4).getInt.toLong & 0xffffffffL)
      val stsc = find(cs, "stsc").getOrElse(return null)
      if (stsc._2 - stsc._1 < 8) return null
      val nRuns = ByteBuffer.wrap(bytes, stsc._1 + 4, 4).getInt
      if (nRuns < 0 || stsc._2 - stsc._1 < 8 + 12L * nRuns) return null
      val runs = Array.tabulate(nRuns) { i =>
        val base = stsc._1 + 8 + 12 * i
        (ByteBuffer.wrap(bytes, base, 4).getInt, // first_chunk (1-based)
          ByteBuffer.wrap(bytes, base + 4, 4).getInt) // samples_per_chunk
      }
      // samples per chunk c = the last run with first_chunk <= c+1
      def perChunk(c: Int): Int =
        runs.takeWhile(_._1 <= c + 1).lastOption.map(_._2).getOrElse(0)
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var sample = 0
      var chunk = 0
      while (sample < sizes.length && chunk < nChunks) {
        var off = offsets(chunk)
        var inChunk = 0
        val cap = perChunk(chunk)
        while (sample < sizes.length && inChunk < cap) {
          val len = sizes(sample)
          if (len < 0 || off + len > bytes.length) return null
          val f = new Array[Byte](len)
          System.arraycopy(bytes, off.toInt, f, 0, len)
          out += ((sample, f))
          off += len; sample += 1; inChunk += 1
        }
        chunk += 1
      }
      if (sample < sizes.length) return null // chunk map didn't cover
      out.result()
    }
  }

  /** MP3 frame-stream writer + header-walk scanner — the metadata layer
    * of MPEG audio, pure byte structure (what mp3val/ffprobe do before
    * any decode): every frame is a 4-byte header (11-bit sync, version,
    * layer, bitrate index, sample-rate index, padding) whose byte
    * length is fully determined by the header, so a single forward walk
    * yields frame count, CBR/VBR-ness, the bitrate profile and the
    * exact duration — no Layer-III decoder involved (sample synthesis
    * stays out of scope; fixture payload bytes are deterministic
    * filler). */
  private[graft] object Mp3Codec {
    // MPEG-1 Layer III tables
    private[operators] val BitrateKbps = Array(
      -1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private[operators] val SampleRates = Array(44100, 48000, 32000, -1)

    def frameLength(kbps: Int, sampleRate: Int, padding: Int): Int =
      144000 * kbps / sampleRate + padding

    /** One structurally valid frame per bitrate index in `bitrateIdxs`
      * (sample-rate index fixed per stream); payload bytes are a
      * deterministic md5 stream over (seed, frameNo). */
    def encode(seed: Array[Byte], bitrateIdxs: Seq[Int],
        srIdx: Int): Array[Byte] = {
      require(SampleRates(srIdx) > 0, s"bad sample-rate index $srIdx")
      val bos = new java.io.ByteArrayOutputStream()
      bitrateIdxs.zipWithIndex.foreach { case (bi, f) =>
        require(BitrateKbps(bi) > 0, s"bad bitrate index $bi")
        val len = frameLength(BitrateKbps(bi), SampleRates(srIdx), 0)
        bos.write(0xff); bos.write(0xfb) // sync + MPEG1 + Layer III + no CRC
        bos.write((bi << 4) | (srIdx << 2)) // no padding bit
        bos.write(0x00)
        val body = new Array[Byte](len - 4)
        val md = java.security.MessageDigest.getInstance("MD5")
        var i = 0
        while (i < body.length) {
          md.reset(); md.update(seed); md.update(f.toByte)
          md.update((i / 16).toByte)
          val d = md.digest()
          val n = math.min(16, body.length - i)
          System.arraycopy(d, 0, body, i, n)
          i += n
        }
        bos.write(body)
      }
      bos.toByteArray
    }

    /** Exact stream duration in ms: frames × 1152 samples at `sr`. */
    def durationMs(nFrames: Int, sr: Int): Long =
      nFrames.toLong * 1152000L / sr

    /** ID3v2 tag writer (v2.3 layout, the wild's most common): `ID3` +
      * version + flags 0 + syncsafe tag size, then one TEXT frame per
      * (4-char id, value) — plain big-endian frame size (the v2.3
      * rule), flags 0, payload = encoding byte 0 (ISO-8859-1) + the
      * text. Fixture-grade but structurally faithful, so the walk
      * parses real v2.3 tags identically. */
    def id3v2(frames: Seq[(String, String)]): Array[Byte] = {
      require(frames.forall(_._1.length == 4), s"frame ids are 4 chars")
      val body = new java.io.ByteArrayOutputStream()
      frames.foreach { case (fid, text) =>
        val payload = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
        body.write(fid.getBytes("US-ASCII"))
        val n = payload.length
        body.write((n >>> 24) & 0xff); body.write((n >>> 16) & 0xff)
        body.write((n >>> 8) & 0xff); body.write(n & 0xff)
        body.write(0); body.write(0)
        body.write(payload)
      }
      val b = body.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((b.length >>> 21) & 0x7f); out.write((b.length >>> 14) & 0x7f)
      out.write((b.length >>> 7) & 0x7f); out.write(b.length & 0x7f)
      out.write(b)
      out.toByteArray
    }

    /** Total bytes of a leading ID3v2 tag (header + body + v2.4
      * footer), or 0 when the prefix is not a well-formed tag — the
      * STRUCTURAL skip [[scan]] applies before its byte-level junk
      * walk (real scanners skip the declared tag length; byte-scanning
      * a tag risks latching onto a coincidental 0xFFFx inside frame
      * text). A size running past the buffer is corruption, not a
      * tag. */
    def id3v2Size(bytes: Array[Byte]): Int = {
      if (bytes == null || bytes.length < 10) return 0
      if (bytes(0) != 'I' || bytes(1) != 'D' || bytes(2) != '3') return 0
      // syncsafe size: a set high bit anywhere is corruption
      if (((bytes(6) | bytes(7) | bytes(8) | bytes(9)) & 0x80) != 0) return 0
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val total = 10 + sz + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      if (total > bytes.length) 0 else total
    }

    /** Walk the leading ID3v2 tag's text frames: (verMajor, tagBytes,
      * title, artist, album) from TIT2/TPE1/TALB — v2.3 (plain
      * big-endian frame sizes) and v2.4 (syncsafe) both handled, the
      * walk stopping at padding (a zero byte where a frame id should
      * start). Null-skip, never guess: no tag, v2.2's 3-char layout,
      * the unsynchronization transform (we don't de-unsync), corrupt
      * ids/sizes. Missing frames yield null FIELDS (a tag without an
      * album is normal); UTF-16-encoded frames skip individually
      * (encodings 1/2 — out of scope like sample decode, stated). */
    def id3v2Meta(bytes: Array[Byte]): (Int, Int, String, String, String) = {
      val total = id3v2Size(bytes)
      if (total == 0) return null
      val ver = bytes(3) & 0xff
      if (ver != 3 && ver != 4) return null
      if ((bytes(5) & 0x80) != 0) return null // unsynchronized
      val end = total - (if ((bytes(5) & 0x10) != 0) 10 else 0)
      var p = 10
      var title: String = null; var artist: String = null
      var album: String = null
      while (p + 10 <= end) {
        if (bytes(p) == 0) return (ver, total, title, artist, album)
        val fid = new String(bytes, p, 4, "US-ASCII")
        if (!fid.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
          return null
        val sz =
          if (ver == 4) {
            if (((bytes(p + 4) | bytes(p + 5) | bytes(p + 6) | bytes(p + 7))
                & 0x80) != 0) return null
            ((bytes(p + 4) & 0x7f) << 21) | ((bytes(p + 5) & 0x7f) << 14) |
              ((bytes(p + 6) & 0x7f) << 7) | (bytes(p + 7) & 0x7f)
          } else java.nio.ByteBuffer.wrap(bytes, p + 4, 4).getInt
        // subtractive bound: v2.3 sizes are a plain 32-bit getInt, so a
        // crafted sz near Int.MaxValue makes `p + 10 + sz` wrap negative
        // and slip past an additive check — compare against the space
        // actually left instead (end - p - 10 can't overflow: p < end)
        if (sz <= 0 || sz > end - p - 10) return null
        if (fid == "TIT2" || fid == "TPE1" || fid == "TALB") {
          val txt = (bytes(p + 10) & 0xff) match {
            case 0 => new String(bytes, p + 11, sz - 1, "ISO-8859-1")
            case 3 => new String(bytes, p + 11, sz - 1, "UTF-8")
            case _ => null // UTF-16 variants skip, the frame stays unread
          }
          if (txt != null) {
            val t = txt.takeWhile(_ != '\u0000') // NUL-terminated text rule
            fid match {
              case "TIT2" => title = t
              case "TPE1" => artist = t
              case _      => album = t
            }
          }
        }
        p += 10 + sz
      }
      (ver, total, title, artist, album)
    }

    /** Whether a valid MPEG-1 Layer III header sits at `p` — the
      * strict is-this-an-mp3 probe [[graft.streaming.MediaAuditStream]]
      * classifies with (sync at offset 0), as opposed to the lenient
      * junk-skipping [[scan]]. */
    def syncAt(bytes: Array[Byte], p: Int): Boolean =
      bytes != null && p + 4 <= bytes.length &&
        (bytes(p) & 0xff) == 0xff && ((bytes(p + 1) & 0xff) & 0xfe) == 0xfa &&
        BitrateKbps((bytes(p + 2) >> 4) & 0xf) > 0 &&
        SampleRates((bytes(p + 2) >> 2) & 0x3) > 0

    /** Walk the frame headers from the first sync word: (sampleRate,
      * per-frame kbps). Leading junk before the first valid header is
      * skipped (the ID3/garbage-prefix rule every scanner applies); the
      * walk stops at the first malformed or truncated header AND at a
      * sample-rate change (one logical stream has one rate — a frame
      * claiming another rate is a splice or a false sync, and counting
      * it would silently falsify the reported rate and duration), and
      * null means no complete frame at all. */
    def scan(bytes: Array[Byte]): (Int, Array[Int]) = {
      if (bytes == null || bytes.length < 4) return null
      // -1 = not a header (junk — keep skipping); -2 = valid header but
      // the frame it declares runs past the buffer (truncated file —
      // STOP: resyncing inside that frame's payload could latch onto a
      // coincidental 0xFFFx in sample data and report its fabricated
      // rate/bitrate as the file's profile)
      def headerAt(p: Int): Int = {
        if (p + 4 > bytes.length) return -1
        val b2 = bytes(p + 2) & 0xff
        if (!syncAt(bytes, p)) return -1
        val bi = (b2 >> 4) & 0xf; val si = (b2 >> 2) & 0x3
        val len = frameLength(BitrateKbps(bi), SampleRates(si), (b2 >> 1) & 1)
        if (p + len > bytes.length) return -2
        len
      }
      // a well-formed leading ID3v2 tag skips STRUCTURALLY (declared
      // length), never byte-by-byte — tag text can contain 0xFFFx
      // leading-junk resync advances byte-by-byte past -2 candidates
      // too: a junk prefix byte can coincidentally form a sync pattern
      // declaring a frame longer than the buffer, and treating that as
      // terminal would null a file whose real complete frames follow.
      // -2 is terminal only once the first COMPLETE frame confirmed the
      // stream (the walk loop below exits on it) — mid-stream it means
      // genuine truncation.
      var start = id3v2Size(bytes)
      while (start + 4 <= bytes.length && headerAt(start) < 0) start += 1
      if (start + 4 > bytes.length) return null
      val srIdx = (bytes(start + 2) >> 2) & 0x3
      val sr = SampleRates(srIdx)
      val kbps = Array.newBuilder[Int]
      var p = start
      var len = headerAt(p)
      while (len > 0 && ((bytes(p + 2) >> 2) & 0x3) == srIdx) {
        kbps += BitrateKbps((bytes(p + 2) >> 4) & 0xf)
        p += len
        len = headerAt(p)
      }
      val ks = kbps.result()
      if (ks.isEmpty) null else (sr, ks)
    }
  }

  /** Ogg page-layer writer + scanner — the container walk for the Ogg
    * family (vorbis/opus/flac-in-ogg), pure byte structure: every page
    * is an `OggS` capture header (version, type flags, 64-bit granule
    * position, serial, page sequence, CRC, segment count + lacing
    * table) whose total length the lacing table fully determines, so a
    * forward walk yields page count, logical-stream serials, the
    * end-of-stream granule (the duration anchor every Ogg tool reads)
    * and packet boundaries — no codec. Fixture payloads are
    * deterministic filler in structurally valid pages. */
  private[graft] object OggCodec {
    private val Magic = "OggS".getBytes("US-ASCII")

    /** One logical stream: `packets` byte payloads, one packet per page
      * (laced 255-chunks + terminator), granule = running packet count,
      * BOS on the first page, EOS on the last. CRC written as 0 (the
      * scanner does not verify checksums — a metadata walk, stated). */
    def encode(serial: Int, packets: Seq[Array[Byte]]): Array[Byte] = {
      // one packet per page and a page holds <= 255 lacing segments: a
      // bigger packet would need cross-page continuation this writer
      // does not express — refuse loudly instead of emitting a lacing
      // table whose low-byte-truncated segment count lies about the body
      packets.foreach(p => require(p.length / 255 + 1 <= 255,
        s"packet of ${p.length} bytes needs page continuation (max ${254 * 255 + 254})"))
      val bos = new java.io.ByteArrayOutputStream()
      packets.zipWithIndex.foreach { case (p, i) =>
        bos.write(Magic)
        bos.write(0) // version
        val flags = (if (i == 0) 2 else 0) |
          (if (i == packets.size - 1) 4 else 0)
        bos.write(flags)
        val granule = (i + 1).toLong
        (0 until 8).foreach(b => bos.write(((granule >> (8 * b)) & 0xff).toInt))
        (0 until 4).foreach(b => bos.write(((serial >> (8 * b)) & 0xff)))
        (0 until 4).foreach(b => bos.write((i >> (8 * b)) & 0xff))
        (0 until 4).foreach(_ => bos.write(0)) // CRC 0, unverified
        val full = p.length / 255
        val rem = p.length % 255
        bos.write(full + 1)
        (0 until full).foreach(_ => bos.write(255))
        bos.write(rem)
        bos.write(p)
      }
      bos.toByteArray
    }

    /** (nPages, serials, lastGranule, nPackets) from the page walk, or
      * null when no valid page starts the stream. The walk stops at the
      * first malformed/truncated page (complete pages only — the
      * [[Mp3Codec.scan]] stop rule); packet count ends lace runs at
      * each sub-255 terminator. */
    def scan(bytes: Array[Byte]): (Int, Seq[Int], Long, Int) = {
      if (bytes == null || bytes.length < 27) return null
      var p = 0
      var nPages = 0
      var nPackets = 0
      var lastGranule = 0L
      val serials = scala.collection.mutable.LinkedHashSet[Int]()
      def u32(at: Int): Int =
        (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8) |
          ((bytes(at + 2) & 0xff) << 16) | ((bytes(at + 3) & 0xff) << 24)
      def result(): (Int, Seq[Int], Long, Int) =
        if (nPages == 0) null
        else (nPages, serials.toSeq, lastGranule, nPackets)
      while (p + 27 <= bytes.length &&
          bytes(p) == Magic(0) && bytes(p + 1) == Magic(1) &&
          bytes(p + 2) == Magic(2) && bytes(p + 3) == Magic(3) &&
          bytes(p + 4) == 0) {
        val nSegs = bytes(p + 26) & 0xff
        if (p + 27 + nSegs > bytes.length) return result()
        var body = 0
        var i = 0
        while (i < nSegs) {
          val lace = bytes(p + 27 + i) & 0xff
          body += lace
          if (lace < 255) nPackets += 1
          i += 1
        }
        if (p + 27 + nSegs + body > bytes.length) return result()
        var g = 0L
        (0 until 8).foreach(b => g |= (bytes(p + 6 + b) & 0xffL) << (8 * b))
        lastGranule = g
        serials += u32(p + 14)
        nPages += 1
        p += 27 + nSegs + body
      }
      result()
    }
  }

  /** Matroska/WebM (EBML) structural walk — the mkv side of the
    * container family, pure bytes: EBML encodes every element as a
    * variable-length ID + variable-length size + payload (the same
    * walk-the-tree discipline as [[Mp4Codec]], different varint
    * framing). The writer emits a minimal valid EBML head + Segment
    * (Info: TimestampScale + Duration; Tracks: TrackEntry per track);
    * the walker parses the varints for real and reports the duration,
    * timestamp scale and track count. Unknown-size elements and
    * malformed varints return null (skip, never throw). */
  private[graft] object MkvCodec {
    // element IDs (as written on the wire, class bytes included)
    private val EbmlHead = Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)
    private val Segment = Array(0x18, 0x53, 0x80, 0x67).map(_.toByte)
    private val Info = Array(0x15, 0x49, 0xa9, 0x66).map(_.toByte)
    private val Tracks = Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte)
    private val TrackEntry = Array(0xae).map(_.toByte)
    private val TimestampScale = Array(0x2a, 0xd7, 0xb1).map(_.toByte)
    private val Duration = Array(0x44, 0x89).map(_.toByte)

    private def sizeVarint(n: Long): Array[Byte] = {
      // 4-byte width: 0x10000000 | n (n < 2^28) — fixed width keeps the
      // writer simple; the READER handles any width
      require(n < (1L << 28), s"size too large: $n")
      Array((0x10 | ((n >> 24) & 0x0f)).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
    }

    private def elem(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
      id ++ sizeVarint(payload.length.toLong) ++ payload

    private def uintPayload(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    }

    /** Minimal Segment: Info(TimestampScale ns/tick, Duration in ticks
      * as a float64) + Tracks(nTracks empty TrackEntries). */
    def encode(timestampScaleNs: Long, durationTicks: Double,
        nTracks: Int): Array[Byte] = {
      val info = elem(Info,
        elem(TimestampScale, uintPayload(timestampScaleNs)) ++
          elem(Duration, {
            val bits = java.lang.Double.doubleToLongBits(durationTicks)
            Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
          }))
      val tracks = elem(Tracks,
        (0 until nTracks).map(_ => elem(TrackEntry, Array[Byte]()))
          .reduceOption(_ ++ _).getOrElse(Array[Byte]()))
      elem(EbmlHead, Array[Byte]()) ++ elem(Segment, info ++ tracks)
    }

    /** Parse a varint at `p`: (value, width) with the marker bit
      * stripped for SIZES and kept for IDs; null semantics via width 0. */
    private def varint(bytes: Array[Byte], p: Int,
        stripMarker: Boolean): (Long, Int) = {
      if (p >= bytes.length) return (0L, 0)
      val b0 = bytes(p) & 0xff
      if (b0 == 0) return (0L, 0)
      val width = Integer.numberOfLeadingZeros(b0) - 23 // 1..8
      if (width < 1 || width > 8 || p + width > bytes.length) return (0L, 0)
      var v = if (stripMarker) (b0 & ((1 << (8 - width)) - 1)).toLong
        else b0.toLong
      var i = 1
      while (i < width) {
        v = (v << 8) | (bytes(p + i) & 0xffL)
        i += 1
      }
      (v, width)
    }

    /** Duration in ms from (ticks, ns/tick) — shared by
      * [[Multimodal.mkvMeta]] and the ingest audit so the two surfaces
      * cannot drift. */
    def durationMs(ticks: Double, scaleNs: Long): Long =
      (ticks * scaleNs / 1e6).toLong

    /** (timestampScaleNs, durationTicks, nTracks) from the EBML walk,
      * or null when the stream is not a well-formed head+Segment. */
    def parseMeta(bytes: Array[Byte]): (Long, Double, Int) = {
      if (bytes == null || bytes.length < 6) return null
      def expectId(p: Int, id: Array[Byte]): Boolean =
        p + id.length <= bytes.length &&
          id.indices.forall(i => bytes(p + i) == id(i))
      // EBML head. All size arithmetic stays in Long and validates
      // against the remaining byte range BEFORE any toInt — a crafted
      // 2^31-class varint must null-skip, never wrap negative and index
      // out of bounds (the skip-never-throw contract)
      if (!expectId(0, EbmlHead)) return null
      var p = EbmlHead.length
      val (headSize, hw) = varint(bytes, p, stripMarker = true)
      if (hw == 0 || headSize > bytes.length - p - hw) return null
      p += hw + headSize.toInt
      if (!expectId(p, Segment)) return null
      p += Segment.length
      val (segSize, sw) = varint(bytes, p, stripMarker = true)
      if (sw == 0 || segSize > bytes.length - p - sw) return null
      p += sw
      val segEnd = p + segSize.toInt
      if (segEnd > bytes.length) return null
      var scale = 1000000L // EBML default
      var durationTicks = -1.0
      var nTracks = 0
      // walk Segment children; recurse into Info and Tracks
      def walk(from: Int, to: Int, inInfo: Boolean, inTracks: Boolean): Boolean = {
        var q = from
        while (q < to) {
          // IDs: match the known ones by their wire bytes; width from
          // the marker bit of the first byte
          val idWidth = {
            val b0 = bytes(q) & 0xff
            if (b0 == 0) return false
            Integer.numberOfLeadingZeros(b0) - 23
          }
          if (idWidth < 1 || idWidth > 4 || q + idWidth > to) return false
          val idBytes = bytes.slice(q, q + idWidth)
          val (sz, w) = varint(bytes, q + idWidth, stripMarker = true)
          // Long-guard BEFORE toInt (same overflow rule as the head),
          // and pe > q is implied by idWidth/w >= 1 so the walk always
          // makes progress — no q-cycle on a zero-size element
          if (w == 0 || sz > (to - (q + idWidth + w)).toLong) return false
          val ps = q + idWidth + w
          val pe = ps + sz.toInt
          if (pe > to) return false
          def is(id: Array[Byte]) = idBytes.sameElements(id)
          if (is(Info)) { if (!walk(ps, pe, true, false)) return false }
          else if (is(Tracks)) { if (!walk(ps, pe, false, true)) return false }
          else if (inInfo && is(TimestampScale)) {
            var v = 0L
            (ps until pe).foreach(i => v = (v << 8) | (bytes(i) & 0xffL))
            scale = v
          } else if (inInfo && is(Duration) && sz == 8) {
            var bits = 0L
            (ps until pe).foreach(i => bits = (bits << 8) | (bytes(i) & 0xffL))
            durationTicks = java.lang.Double.longBitsToDouble(bits)
          } else if (inTracks && is(TrackEntry)) nTracks += 1
          q = pe
        }
        true
      }
      if (!walk(p, segEnd, inInfo = false, inTracks = false)) return null
      if (durationTicks < 0) return null
      (scale, durationTicks, nTracks)
    }
  }

  /** Multi-frame GIF codec over `javax.imageio`'s sequence API — the one
    * REAL multi-frame container the JDK ships (mp4/mkv/mp3 need external
    * codecs and stay stubbed). Beside the home-grown GFV0 this makes the
    * frame-demux plumbing real-codec end-to-end: a standard container, a
    * standard reader, no byte-range guessing. Frames are full-canvas (the
    * writer emits them that way), so per-frame dims equal the logical
    * screen. GIF palettizes to <=256 colors, so pixel values are NOT
    * preserved bit-for-bit — dims, frame count and order are. */
  private[operators] object GifCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    val Magic: Array[Byte] = "GIF8".getBytes("US-ASCII")

    def encode(frames: Seq[BufferedImage]): Array[Byte] = {
      require(frames.nonEmpty, "empty frame list")
      val bos = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      bos.toByteArray
    }

    /** Parsed frames as (frameNo, frame), or null when the payload is not
      * a GIF or the stream is corrupt (same non-fatal contract as
      * [[ImageCodec.decode]] — one bad file must not kill a 100 TB scan). */
    def decode(bytes: Array[Byte]): Seq[(Int, BufferedImage)] = {
      if (bytes == null || bytes.length < 6 || !bytes.startsWith(Magic)) return null
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        (0 until n).map(i => (i, reader.read(i)))
      } catch {
        case scala.util.control.NonFatal(_) => null
      } finally reader.dispose()
    }
  }

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

  /** Real-codec variant of [[fromText]]: each row becomes an actual PNG (or
    * JPEG) whose pixels are an md5 stream over the text and whose dims are
    * content-dependent (`16 + id % 48` by `16 + octet_length(text) % 48`) — so a
    * downstream decode proves the codec round-trip, not just plumbing.
    *
    * The cheap (id, text) rows are repartitioned BEFORE the render so the
    * CPU-heavy encode uses every core even when the source is one small
    * file (the 100 TB shape: shuffle the light rows, generate heavy
    * payloads map-side after — payloads themselves never shuffle).
    * `numPartitions` <= 0 means the session's default parallelism. */
  def fromTextAsImages(docs: DataFrame, idCol: String, textCol: String,
      format: String = "png", numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id — " +
            "a negative id would make the sign-preserving % yield dims <= 0")
          val seed = r.getString(1).getBytes("UTF-8")
          // dims keyed on UTF-8 byte length (= DuckDB octet_length), not
          // String.length — UTF-16 units diverge on astral chars
          val w = (16 + id % 48).toInt
          val h = (16 + seed.length % 48).toInt
          val png = ImageCodec.encode(ImageCodec.render(seed, w, h), format)
          Row(id, "image", png,
            Row(w, h, null, null, format))
        }
      }(enc)
  }

  /** Real decode pass: payload -> decoded dims (+ pixel count). Undecodable
    * or null payloads yield null dims instead of failing the scan. */
  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_pixels", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val img = ImageCodec.decode(r.getAs[Array[Byte]]("payload"))
        if (img == null) Row(r.getLong(0), null, null, null)
        else Row(r.getLong(0), img.getWidth.toLong, img.getHeight.toLong,
          img.getWidth.toLong * img.getHeight)
      }
    }(enc)
  }

  /** Real resize: decode, scale by `1/div` (integer-division dims, floor at
    * 1px), re-encode as PNG. Rows whose payload doesn't decode pass through
    * unchanged — a 100 TB scan must not die on one corrupt file. */
  def resizeImages(media: DataFrame, div: Int): DataFrame = {
    require(div >= 1, s"div must be >= 1, got $div")
    val enc = RowEncoder.encoderFor(media.schema)
    val pIdx = media.schema.fieldIndex("payload")
    // meta.width/height must keep describing the payload after the rewrite
    // — a stale struct poisons any consumer that trusts it over a decode
    val metaIdx = media.schema.fieldNames.indexOf("meta")
    val (wIdx, hIdx) =
      if (metaIdx < 0) (-1, -1)
      else {
        val st = media.schema(metaIdx).dataType.asInstanceOf[StructType]
        (st.fieldNames.indexOf("width"), st.fieldNames.indexOf("height"))
      }
    media.mapPartitions { rows =>
      rows.map { r =>
        // positional access: rows off an encoder pipeline carry no schema
        val img = ImageCodec.decode(r.getAs[Array[Byte]](pIdx))
        if (img == null) r
        else {
          val w = math.max(1, img.getWidth / div)
          val h = math.max(1, img.getHeight / div)
          val png = ImageCodec.encode(ImageCodec.resize(img, w, h), "png")
          val base = r.toSeq.updated(pIdx, png)
          val withMeta =
            if (metaIdx < 0 || r.isNullAt(metaIdx)) base
            else {
              val m = r.getStruct(metaIdx).toSeq
              val m2 = if (wIdx >= 0) m.updated(wIdx, w) else m
              val m3 = if (hIdx >= 0) m2.updated(hIdx, h) else m2
              base.updated(metaIdx, Row.fromSeq(m3))
            }
          Row.fromSeq(withMeta)
        }
      }
    }(enc)
  }

  /** Real-codec audio variant of [[fromText]]: each row becomes an actual
    * mono 16-bit WAV whose samples are an md5 stream over the text and
    * whose frame count is content-dependent (`400 + octet_length(text) %
    * 800` at 8 kHz) — a downstream decode proves the WAV round-trip.
    * Same scale shape as [[fromTextAsImages]]: light rows repartition
    * BEFORE the render, payloads never shuffle. */
  def fromTextAsWavs(docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 8000, numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val seed = r.getString(1).getBytes("UTF-8")
          val frames = 400 + seed.length % 800
          val wav = AudioCodec.encodeWav(AudioCodec.render(seed, frames), sampleRate)
          Row(id, "audio", wav,
            Row(null, null, sampleRate, frames.toLong * 1000L / sampleRate, "wav"))
        }
      }(enc)
  }

  /** Real audio decode pass: payload -> container-declared rate + frame
    * count + cheap signal features (RMS, zero crossings). Undecodable or
    * null payloads yield null fields instead of failing the scan. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.decodeWav(r.getAs[Array[Byte]]("payload")) match {
          case null => Row(r.getLong(0), null, null, null, null, null)
          case (rate, samples) =>
            Row(r.getLong(0), rate.toLong, samples.length.toLong,
              samples.length.toLong * 1000L / rate,
              AudioCodec.rms(samples), AudioCodec.zeroCrossings(samples))
        }
      }
    }(enc)
  }

  /** Real-container video variant of [[fromText]]: `2 + id % 4` PNG frames
    * (per-frame seeds, shared content-dependent dims) in a GFV0 stream.
    * Same scale shape as the image/audio paths. */
  def fromTextAsVideos(docs: DataFrame, idCol: String, textCol: String,
      fps: Int = 25, numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id — " +
            "a negative id would make the sign-preserving % yield dims <= 0")
          val seed = r.getString(1).getBytes("UTF-8")
          val w = (16 + id % 48).toInt
          val h = (16 + seed.length % 48).toInt
          val nFrames = (2 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            ImageCodec.encode(ImageCodec.render(seed :+ f.toByte, w, h), "png")
          }
          Row(id, "video", VideoCodec.encode(frames),
            Row(w, h, null, nFrames.toLong * 1000L / fps, "gfv-png"))
        }
      }(enc)
  }

  /** Standard-container variant of [[fromTextAsVideos]]: the same
    * deterministic frames (seed per frame, content-dependent dims) muxed
    * into a single ANIMATED GIF payload instead of GFV0 — real codec on
    * both sides of the container boundary. Same per-doc arithmetic
    * (`2 + id % 4` frames, w = 16 + id % 48, h = 16 + len % 48) so the
    * two containers are oracle-checkable against identical SQL. */
  def fromTextAsGifs(docs: DataFrame, idCol: String, textCol: String,
      fps: Int = 25, numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id — " +
            "a negative id would make the sign-preserving % yield dims <= 0")
          val seed = r.getString(1).getBytes("UTF-8")
          val w = (16 + id % 48).toInt
          val h = (16 + seed.length % 48).toInt
          val nFrames = (2 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            ImageCodec.render(seed :+ f.toByte, w, h)
          }
          Row(id, "video", GifCodec.encode(frames),
            Row(w, h, null, nFrames.toLong * 1000L / fps, "gif"))
        }
      }(enc)
  }

  /** Standard-container variant of [[fromTextAsVideos]] in ISO-BMFF: the
    * same deterministic PNG frames (seed per frame, content-dependent
    * dims) muxed by [[Mp4Codec]] into a structurally valid MP4 box tree
    * (full stbl) at 25 fps / timescale 1000 — the fixture the mp4
    * metadata/demux surfaces parse for real. */
  def fromTextAsMp4s(docs: DataFrame, idCol: String, textCol: String,
      fps: Int = 25, numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id — " +
            "a negative id would make the sign-preserving % yield dims <= 0")
          val seed = r.getString(1).getBytes("UTF-8")
          val w = (16 + id % 48).toInt
          val h = (16 + seed.length % 48).toInt
          val nFrames = (2 + id % 4).toInt
          val frames = (0 until nFrames).map { f =>
            ImageCodec.encode(ImageCodec.render(seed :+ f.toByte, w, h), "png")
          }
          Row(id, "video", Mp4Codec.encode(frames, w, h, 1000 / fps),
            Row(w, h, null, nFrames.toLong * 1000L / fps, "mp4-png"))
        }
      }(enc)
  }

  /** MP4 container metadata WITHOUT decode — the 100 TB media-audit
    * step ("what is this file, how long, what dims") that must never
    * touch a codec: per payload, the brand, mvhd timescale, duration in
    * ms, sample count (stsz) and the tkhd 16.16 track dims, all parsed
    * from the real box tree by [[Mp4Codec.parseMeta]]. Non-MP4 or
    * structurally corrupt payloads are skipped. Map-side only; payload
    * bytes never shuffle. */
  def mp4Meta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("brand", StringType, nullable = false),
      StructField("timescale", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        Mp4Codec.parseMeta(r.getAs[Array[Byte]]("payload")) match {
          case null => Iterator.empty
          case (brand, ts, dur, n, w, h) =>
            Iterator.single(Row(r.getLong(0), brand, ts,
              Mp4Codec.durationMs(dur, ts), n, w, h))
        }
      }
    }(enc)
  }

  /** Deterministic MP3 frame-stream fixture: per doc a stream of
    * `20 + id % 30` structurally valid MPEG-1 Layer III frames at
    * 44.1 kHz — even ids CBR at 128 kbps, odd ids VBR cycling
    * 128/160/192 by frame — with md5-stream filler payloads. The
    * [[mp3Scan]] surface walks these headers for real. */
  def fromTextAsMp3s(docs: DataFrame, idCol: String, textCol: String,
      numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id")
          val seed = r.getString(1).getBytes("UTF-8")
          val nFrames = (20 + id % 30).toInt
          // bitrate indexes into Mp3Codec.BitrateKbps: 9=128, 10=160, 11=192
          val idxs =
            if (id % 2 == 0) Seq.fill(nFrames)(9)
            else (0 until nFrames).map(f => 9 + f % 3)
          val payload = Mp3Codec.encode(seed, idxs, srIdx = 0)
          Row(id, "audio", payload,
            Row(null, null, 44100, nFrames.toLong * 1152000L / 44100L, "mp3"))
        }
      }(enc)
  }

  /** Deterministic Ogg fixture: per doc one logical stream (serial =
    * id), `3 + id % 5` one-packet pages with md5-filler payloads of
    * `50 + (id + pageNo) % 100` bytes; granule = running packet count
    * (the fixture's duration anchor). */
  def fromTextAsOggs(docs: DataFrame, idCol: String, textCol: String,
      numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id")
          val seed = r.getString(1).getBytes("UTF-8")
          val nPages = (3 + id % 5).toInt
          val packets = (0 until nPages).map { pg =>
            val len = (50 + (id + pg) % 100).toInt
            val body = new Array[Byte](len)
            val md = java.security.MessageDigest.getInstance("MD5")
            var i = 0
            while (i < len) {
              md.reset(); md.update(seed); md.update(pg.toByte)
              md.update((i / 16).toByte)
              val d = md.digest()
              val c = math.min(16, len - i)
              System.arraycopy(d, 0, body, i, c)
              i += c
            }
            body
          }
          Row(id, "audio", OggCodec.encode(id.toInt, packets),
            Row(null, null, null, null, "ogg"))
        }
      }(enc)
  }

  /** Ogg page-layer scan WITHOUT decode: per payload the page count,
    * logical-stream count, packet count and the end-of-stream granule
    * position (the duration anchor — seconds = granule / codec rate,
    * the codec-specific division left to the caller, stated). Payloads
    * with no valid page skip. Map-side only. */
  def oggScan(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_pages", IntegerType, nullable = false),
      StructField("n_streams", IntegerType, nullable = false),
      StructField("n_packets", IntegerType, nullable = false),
      StructField("last_granule", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        OggCodec.scan(r.getAs[Array[Byte]]("payload")) match {
          case null => Iterator.empty
          case (pages, serials, granule, packets) =>
            Iterator.single(Row(r.getLong(0), pages, serials.size,
              packets, granule))
        }
      }
    }(enc)
  }

  /** Deterministic Matroska fixture: timestamp scale 1,000,000 ns
    * (the EBML default, written explicitly), duration `(500 + id % 1000)`
    * ticks, `1 + id % 3` tracks. */
  def fromTextAsMkvs(docs: DataFrame, idCol: String, textCol: String,
      numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id")
          val ticks = (500 + id % 1000).toDouble
          val tracks = (1 + id % 3).toInt
          Row(id, "video", MkvCodec.encode(1000000L, ticks, tracks),
            Row(null, null, null, ticks.toLong, "mkv"))
        }
      }(enc)
  }

  /** Matroska metadata WITHOUT decode ([[MkvCodec.parseMeta]] — the
    * EBML varint walk): per payload the timestamp scale (ns/tick), the
    * duration in ms (ticks × scale / 10⁶) and the track count.
    * Non-EBML or malformed payloads skip. Map-side only. */
  def mkvMeta(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("timestamp_scale_ns", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false),
      StructField("n_tracks", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        MkvCodec.parseMeta(r.getAs[Array[Byte]]("payload")) match {
          case null => Iterator.empty
          case (scale, ticks, tracks) =>
            Iterator.single(Row(r.getLong(0), scale,
              MkvCodec.durationMs(ticks, scale), tracks))
        }
      }
    }(enc)
  }

  /** MP3 stream scan WITHOUT decode ([[Mp3Codec.scan]] — the mp3val/
    * ffprobe metadata walk): per payload, the complete-frame count, the
    * sample rate, min/max frame bitrate, the CBR flag and the exact
    * duration (frames × 1152 samples at the stream's rate). Payloads
    * with no valid frame are skipped; a truncated tail counts only the
    * complete frames (the scanner's stop rule). Map-side only. */
  def mp3Scan(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("min_kbps", IntegerType, nullable = false),
      StructField("max_kbps", IntegerType, nullable = false),
      StructField("cbr", BooleanType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        Mp3Codec.scan(r.getAs[Array[Byte]]("payload")) match {
          case null => Iterator.empty
          case (sr, kbps) =>
            Iterator.single(Row(r.getLong(0), kbps.length, sr,
              kbps.min, kbps.max, kbps.min == kbps.max,
              Mp3Codec.durationMs(kbps.length, sr)))
        }
      }
    }(enc)
  }

  /** ID3v2 tag walk ([[Mp3Codec.id3v2Meta]]): per payload carrying a
    * well-formed leading tag, the version, total tag bytes and the
    * TIT2/TPE1/TALB text — the title/artist metadata a media audit
    * actually routes on (quarantine-by-source, dedup-by-title).
    * Untagged or unparseable payloads skip (the scan contract);
    * missing frames are null FIELDS. Map-side only. */
  def id3Tags(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("id3_version", IntegerType, nullable = false),
      StructField("tag_bytes", IntegerType, nullable = false),
      StructField("title", StringType, nullable = true),
      StructField("artist", StringType, nullable = true),
      StructField("album", StringType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        Mp3Codec.id3v2Meta(r.getAs[Array[Byte]]("payload")) match {
          case null => Iterator.empty
          case (ver, total, title, artist, album) =>
            Iterator.single(Row(r.getLong(0), ver, total,
              title, artist, album))
        }
      }
    }(enc)
  }

  /** [[fromTextAsMp3s]] with a leading ID3v2.3 tag: TIT2 = `doc <id>`,
    * TPE1 = `artist <id % 7>`, TALB = `album <id % 3>` — deterministic
    * from the id so an oracle recomputes them, frames exactly the
    * untagged fixture's (the tag must be TRANSPARENT to the stream
    * scan — that invariance is part of what q334 gates). */
  def fromTextAsTaggedMp3s(docs: DataFrame, idCol: String, textCol: String,
      numPartitions: Int = 0): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    val n =
      if (numPartitions > 0) numPartitions
      else docs.sparkSession.sparkContext.defaultParallelism
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        coalesce(col(textCol), lit("")).as("text"))
      .repartition(n)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          require(id >= 0, s"media id must be non-negative, got $id")
          val seed = r.getString(1).getBytes("UTF-8")
          val nFrames = (20 + id % 30).toInt
          val idxs =
            if (id % 2 == 0) Seq.fill(nFrames)(9)
            else (0 until nFrames).map(f => 9 + f % 3)
          val tag = Mp3Codec.id3v2(Seq(
            "TIT2" -> s"doc $id",
            "TPE1" -> s"artist ${id % 7}",
            "TALB" -> s"album ${id % 3}"))
          val payload = tag ++ Mp3Codec.encode(seed, idxs, srIdx = 0)
          Row(id, "audio", payload,
            Row(null, null, 44100, nFrames.toLong * 1152000L / 44100L, "mp3"))
        }
      }(enc)
  }

  /** Real frame sampling: demux the container (GFV0, multi-frame GIF or
    * ISO-BMFF MP4 with PNG samples — dispatched on magic bytes / box
    * structure), keep every `stride`-th frame, decode each
    * kept frame through javax.imageio — one output row per sampled frame
    * with its decoded dims. Payloads that are none of the containers are
    * skipped (a corrupt file must not kill a 100 TB scan). */
  def demuxFrames(media: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        def decodedRows(frames: Seq[(Int, Array[Byte])]) =
          frames.iterator.collect { case (f, png) if f % stride == 0 =>
            val img = ImageCodec.decode(png)
            if (img == null) Row(r.getLong(0), f, null, null)
            else Row(r.getLong(0), f, img.getWidth.toLong, img.getHeight.toLong)
          }
        VideoCodec.decode(payload) match {
          case null =>
            GifCodec.decode(payload) match {
              case null =>
                Mp4Codec.demux(payload) match {
                  case null => Iterator.empty
                  case frames => decodedRows(frames)
                }
              case frames =>
                frames.iterator.collect { case (f, img) if f % stride == 0 =>
                  Row(r.getLong(0), f, img.getWidth.toLong, img.getHeight.toLong)
                }
            }
          case frames => decodedRows(frames)
        }
      }
    }(enc)
  }

  // ---------------------------------------------------------------------
  // STUB decode kernel (non-image payloads). Image payloads take the real
  // javax.imageio path above; this byte-histogram fallback stands in for
  // codecs the JDK lacks (audio/video frames) — the signature and the
  // per-partition batching around it do not change.
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

  /** Sample-magnitude histogram, `dim` buckets, L1-normalized — the audio
    * counterpart of ImageCodec.lumaFeature (same output contract). */
  private[operators] def audioFeature(samples: Array[Short], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var i = 0
    while (i < samples.length) {
      val mag = math.abs(samples(i).toInt) // 0..32768
      out(math.min(mag * dim / 32769, dim - 1)) += 1f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) /= samples.length; j += 1 }
    out
  }

  /** Per-partition batch decode: payload -> compact feature, dropping the
    * heavy bytes before anything downstream shuffles. Dispatch is on the
    * `kind` column — NOT payload sniffing: probing every row through the
    * ImageIO SPI chain and an exception-throwing AudioSystem lookup is
    * hot-path poison at scale, and bytes that coincidentally parse as
    * another medium would silently change feature semantics. `image` rows
    * get a luma histogram via javax.imageio, `audio` rows a
    * sample-magnitude histogram via javax.sound.sampled; anything else —
    * including payloads their codec cannot decode — falls back to the
    * byte-histogram stub (same L1-normalized contract). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "kind", "payload").mapPartitions { rows =>
      // per-partition init happens HERE (codec handles, model weights, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val kind = r.getString(1)
        val feature = kind match {
          case "image" =>
            val img = ImageCodec.decode(payload)
            if (img != null) ImageCodec.lumaFeature(img, dim) else decodeBytes(payload, dim)
          case "audio" =>
            AudioCodec.decodeWav(payload) match {
              case null => decodeBytes(payload, dim)
              case (_, samples) => audioFeature(samples, dim)
            }
          case _ => decodeBytes(payload, dim)
        }
        Row(r.getLong(0), kind,
          (if (payload == null) 0 else payload.length).toLong,
          feature)
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

  /** 64-bit difference hash of a decoded image (the classic dHash:
    * Krawetz, "Kind of Like That", 2013): downscale to 9x8, integer luma
    * per pixel (the [[ImageCodec.lumaFeature]] BT.601 arithmetic — exact
    * across JVMs), bit (y*8+x) set iff luma rises left-to-right between
    * horizontally adjacent pixels. Identical payloads hash identically;
    * rescaled/re-encoded variants land a few bits apart — the perceptual
    * identity a byte-level md5 cannot see. */
  private[operators] def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val s = ImageCodec.resize(img, 9, 8)
    def luma(x: Int, y: Int): Int = {
      val rgb = s.getRGB(x, y)
      (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) + 29 * (rgb & 0xff)) >> 8
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) h |= (1L << (y * 8 + x))
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image dHash (X147): `(media_id, dhash)`, null for undecodable
    * payloads (a 100 TB scan must not die on one corrupt file). JDK codec
    * decode forces `mapPartitions` (the documented Catalyst-inexpressible
    * exception); the pass is map-side only — payloads never shuffle. */
  def imageDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val img = ImageCodec.decode(r.getAs[Array[Byte]](1))
        if (img == null) Row(r.getLong(0), null) else Row(r.getLong(0), dhashOf(img))
      }
    }(enc)
  }

  /** Perceptual image near-dup pairs (X147) over [[imageDHash]] sketches:
    * `(id1, id2, hamming)` for pairs within `maxHamming` bits. The pair
    * stage is the SimHash prefix-bucket discipline on 8-byte keys: the 64
    * bits split into `numBands` contiguous blocks, and by pigeonhole a
    * pair within `maxHamming < numBands` bits agrees EXACTLY on at least
    * one block — candidates only form inside (band, block-value) buckets
    * (sum-of-bucket-squares, never N²), then one codegen'd
    * `bit_count(xor)` verifies true distance. Only (id, 8-byte hash)
    * pairs shuffle; images stay in their scan partitions. The hash frame
    * is pinned (eager localCheckpoint) so the decode pass runs ONCE, not
    * once per join side — the returned frame is backed by that pin;
    * callers release via [[graft.util.Pins.release]] after materializing
    * (the [[Dedup.dedupGroups]] contract). */
  def imagePerceptualDups(media: DataFrame, maxHamming: Int,
      numBands: Int = 4): DataFrame = {
    val hashed = imageDHash(media).filter(col("dhash").isNotNull)
      .localCheckpoint(true) // decode once; both join sides read the pin
    hammingPairs(hashed, "dhash", maxHamming, numBands)
  }

  /** Shared pair stage of the perceptual-dup family (X147 images, X153
    * audio): the SimHash prefix-bucket discipline on 64-bit sketches —
    * split into `numBands` contiguous blocks, and by pigeonhole a pair
    * within `maxHamming < numBands` bits agrees EXACTLY on at least one
    * block, so candidates only form inside (band, block-value) buckets
    * (sum-of-bucket-squares, never N²); one codegen'd `bit_count(xor)`
    * verifies true distance. Only (id, 8-byte hash) rows shuffle. */
  private[operators] def hammingPairs(hashed: DataFrame, hashCol: String,
      maxHamming: Int, numBands: Int): DataFrame = {
    require(numBands >= 1 && 64 % numBands == 0,
      s"numBands must divide 64, got $numBands")
    require(maxHamming >= 0 && maxHamming < numBands,
      s"pigeonhole guarantee needs maxHamming < numBands, got $maxHamming/$numBands")
    val width = 64 / numBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val banded = hashed.select(col("media_id"), col(hashCol),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"),
          (shiftrightunsigned(col(hashCol), b * width).bitwiseAND(lit(mask)))
            .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col(hashCol),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit envelope-difference hash of a PCM clip (X153) — the audio
    * analogue of [[dhashOf]]: 65 equal time windows of mean absolute
    * amplitude, bit `i` set iff window `i+1` is louder than window `i`.
    * Comparing CONSECUTIVE window means makes the sketch invariant under
    * uniform gain (both sides of each comparison scale together) and
    * robust to re-encoding — the perceptual identity a byte-md5 cannot
    * see. Exactness: window sums are integer; means compare by
    * cross-multiplication `sum_{i+1}·cnt_i > sum_i·cnt_{i+1}` — no
    * division, no floats, identical on every JVM (overflow-safe to ~1e6
    * samples/window, ~2 h of 8 kHz audio per clip). Returns null for
    * clips under 65 samples (too short to fingerprint — the scan must
    * not die). */
  private[operators] def ahashOf(samples: Array[Short]): java.lang.Long = {
    val n = samples.length
    if (n < 65) return null
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val lo = (w.toLong * n / 65).toInt
      val hi = ((w + 1).toLong * n / 65).toInt
      var i = lo
      var s = 0L
      while (i < hi) { s += math.abs(samples(i).toInt); i += 1 }
      sums(w) = s; cnts(w) = hi - lo
      w += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (sums(b + 1) * cnts(b) > sums(b) * cnts(b + 1)) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Per-clip envelope hash (X153): `(media_id, ahash)`, null for
    * undecodable or sub-65-sample payloads. JDK codec decode forces
    * `mapPartitions` (the documented Catalyst-inexpressible exception);
    * map-side only — payloads never shuffle. */
  def audioEnvelopeHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val dec = AudioCodec.decodeWav(r.getAs[Array[Byte]](1))
        if (dec == null) Row(r.getLong(0), null)
        else Row(r.getLong(0), ahashOf(dec._2))
      }
    }(enc)
  }

  /** Perceptual audio near-dup pairs (X153) over [[audioEnvelopeHash]]
    * sketches: `(id1, id2, hamming)` within `maxHamming` bits, via the
    * shared [[hammingPairs]] pigeonhole banding. Identical payloads hash
    * identically; re-gained/re-encoded variants land a few bits apart.
    * The hash frame is pinned (eager localCheckpoint) so the decode pass
    * runs ONCE, not once per join side — the returned frame is backed by
    * that pin; callers release via [[graft.util.Pins.release]] after
    * materializing (the [[Dedup.dedupGroups]] contract). */
  def audioPerceptualDups(media: DataFrame, maxHamming: Int,
      numBands: Int = 4): DataFrame = {
    val hashed = audioEnvelopeHash(media).filter(col("ahash").isNotNull)
      .localCheckpoint(true) // decode once; both join sides read the pin
    hammingPairs(hashed, "ahash", maxHamming, numBands)
  }
}
