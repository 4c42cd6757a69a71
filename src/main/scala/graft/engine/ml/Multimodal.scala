package graft.engine.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.10 north star): media travel
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run as partition-local
  * batch transforms.
  *
  * The image/video codec step is STUBBED (this container has no image
  * libraries): [[FakeCodec]] derives deterministic pseudo-features from
  * the bytes. Everything around it — schema, encoders, partition-local
  * batching, the operator signatures — is the real Spark shape: swap
  * `FakeCodec` for a JNI/library codec and the pipeline is production.
  * The AUDIO path is NOT a stub: [[WavCodec]] encodes and parses real
  * RIFF/WAVE PCM16 bytes (round 11 — canonical WAV needs no external
  * library), so the `multimodal_wav_decode` key exercises genuine
  * byte-level decoding.
  *
  * Scale notes: `mapPartitions` keeps the (expensive) codec amortized
  * per-batch, media bytes never shuffle (features are extracted before
  * any wide operation), and the binary column stays prunable — plans
  * that don't touch `media` never read those parquet pages.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
      durationMs: Long)
  case class MediaRow(media_id: Long, media: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, byte_len: Int,
      checksum: Long, features: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB codec — deterministic stand-in for a real image/audio decoder.
    * Derives a checksum and a fixed-width feature vector purely from the
    * bytes, so tests are reproducible anywhere. */
  object FakeCodec {
    val FeatureDim = 8
    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
    def decode(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
  }

  /** Wrap raw byte rows into the canonical multimodal schema. */
  def asMediaTable(spark: SparkSession, rows: Seq[MediaRow]): Dataset[MediaRow] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** Feature extraction: partition-local batch decode. The codec is
    * invoked once per row inside mapPartitions — with a real library this
    * is where you'd batch rows into the codec's native batch size. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.media.length,
          FakeCodec.checksum(r.media), FakeCodec.decode(r.media))
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size window of the payload
    * becomes a "frame" (stand-in for video frame extraction). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int,
      stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(frameSize).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 =>
          FrameRow(r.media_id, idx, chunk)
      }
    }
  }

  /** REAL byte-level audio codec (round-11: the one family member that
    * is NOT a stub — no external library needed because canonical
    * RIFF/WAVE PCM16 is a 44-byte header + little-endian samples).
    * [[WavCodec.encodePcm16]] emits a spec-conformant WAV file;
    * [[WavCodec.decodePcm16]] parses one back by reading the actual
    * header fields and sample bytes — so a wrong endianness, offset or
    * chunk length breaks the decode, unlike the FakeCodec path. The
    * JDK's own javax.sound parser accepts the encoded bytes
    * (independent-decoder golden gate in MultimodalWavSpec). */
  object WavCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    case class Decoded(ok: Boolean, sampleRate: Int, channels: Int,
        bits: Int, samples: Array[Short])

    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16) // PCM fmt chunk length
      bb.putShort(1) // audio format 1 = PCM
      bb.putShort(1) // channels
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2) // byte rate = rate * block align
      bb.putShort(2) // block align (mono 16-bit)
      bb.putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Chunk-walking RIFF parse (ADVICE r11): any spec-valid mono
      * PCM16 WAV decodes — extra chunks (LIST/fact/cue), a
      * WAVE_FORMAT_EXTENSIBLE-length fmt chunk, and trailing metadata
      * after `data` are all walked past rather than rejected, so the
      * codec is safe on external bytes, not just its own canonical
      * output. Canonical 44-byte-header files take the same path and
      * decode bit-identically (the `multimodal_wav_decode` oracle hash
      * is unchanged). Chunks are 4-byte tag + 4-byte LE size + payload
      * padded to an even offset, per the RIFF spec. */
    def decodePcm16(bytes: Array[Byte]): Decoded = {
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return Decoded(ok = false, 0, 0, 0, Array.empty)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var fmt = 0; var channels = 0; var rate = 0; var bits = 0
      var sawFmt = false
      var dataOff = -1; var dataLen = -1
      var off = 12
      while (off + 8 <= bytes.length && (dataOff < 0 || !sawFmt)) {
        val t = tag(off)
        val len = bb.getInt(off + 4)
        if (len < 0 || off + 8 + len > bytes.length)
          return Decoded(ok = false, rate, channels, bits, Array.empty)
        if (t == "fmt " && len >= 16) {
          fmt = bb.getShort(off + 8)
          channels = bb.getShort(off + 10)
          rate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22)
          sawFmt = true
        } else if (t == "data" && dataOff < 0) {
          dataOff = off + 8
          dataLen = len
        }
        off += 8 + len + (len & 1) // RIFF pads chunks to even offsets
      }
      if (!sawFmt || dataOff < 0 || fmt != 1 || bits != 16 ||
          channels != 1 || dataLen % 2 != 0)
        return Decoded(ok = false, rate, channels, bits, Array.empty)
      val out = new Array[Short](dataLen / 2)
      var i = 0
      while (i < out.length) {
        out(i) = bb.getShort(dataOff + 2 * i)
        i += 1
      }
      Decoded(ok = true, rate, channels, bits, out)
    }
  }

  /** REAL byte-level image codec (round 12 — the WavCodec discipline
    * applied to images): uncompressed 24-bit BMP needs no external
    * library, just the 14-byte BITMAPFILEHEADER + 40-byte
    * BITMAPINFOHEADER + bottom-up BGR pixel rows padded to 4-byte
    * boundaries. [[BmpCodec.encodeBgr24]] emits a spec-conformant BMP;
    * [[BmpCodec.decodeBgr24]] parses one back by reading the actual
    * header fields (signature, pixel-array offset, dimensions, bpp,
    * compression) and un-flipping the bottom-up row order — so a wrong
    * offset, stride, padding or channel order breaks the decode. The
    * JDK's own javax.imageio BMP reader accepts the encoded bytes and
    * returns identical pixels (independent-decoder golden gate in
    * MultimodalBmpSpec). This replaces [[FakeCodec]] for the still-image
    * path; only video remains a stub. */
  object BmpCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Pixels are packed 0xRRGGBB, row-major, y = 0 at the TOP (the
      * natural raster order); the codec owns the bottom-up flip. */
    case class DecodedImg(ok: Boolean, width: Int, height: Int,
        pixels: Array[Int])

    private def rowSize(width: Int): Int = (3 * width + 3) & ~3

    def encodeBgr24(width: Int, height: Int,
        pixels: Array[Int]): Array[Byte] = {
      require(pixels.length == width * height, "pixel count mismatch")
      val stride = rowSize(width)
      val dataLen = stride * height
      val bb = ByteBuffer.allocate(54 + dataLen)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte)
      bb.putInt(54 + dataLen) // file size
      bb.putShort(0).putShort(0) // reserved
      bb.putInt(54) // pixel-array offset
      bb.putInt(40) // BITMAPINFOHEADER size
      bb.putInt(width)
      bb.putInt(height) // positive = bottom-up row order
      bb.putShort(1) // planes
      bb.putShort(24) // bits per pixel
      bb.putInt(0) // BI_RGB (uncompressed)
      bb.putInt(dataLen)
      bb.putInt(2835).putInt(2835) // 72 dpi in pixels/metre
      bb.putInt(0).putInt(0) // palette size / important colors
      var y = height - 1
      while (y >= 0) { // bottom row first
        var x = 0
        while (x < width) {
          val p = pixels(y * width + x)
          bb.put((p & 0xff).toByte) // B
          bb.put(((p >> 8) & 0xff).toByte) // G
          bb.put(((p >> 16) & 0xff).toByte) // R
          x += 1
        }
        var pad = stride - 3 * width
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
      bb.array()
    }

    def decodeBgr24(bytes: Array[Byte]): DecodedImg = {
      if (bytes.length < 54 || bytes(0) != 'B'.toByte ||
          bytes(1) != 'M'.toByte)
        return DecodedImg(ok = false, 0, 0, Array.empty)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val fileSize = bb.getInt(2)
      val pixOff = bb.getInt(10)
      val hdrSize = bb.getInt(14)
      val width = bb.getInt(18)
      val height = bb.getInt(22)
      val planes = bb.getShort(26)
      val bpp = bb.getShort(28)
      val compression = bb.getInt(30)
      if (fileSize != bytes.length || hdrSize != 40 || planes != 1 ||
          bpp != 24 || compression != 0 || width <= 0 || height <= 0 ||
          pixOff < 54)
        return DecodedImg(ok = false, width, height, Array.empty)
      val stride = rowSize(width)
      if (pixOff.toLong + stride.toLong * height > bytes.length)
        return DecodedImg(ok = false, width, height, Array.empty)
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val rowOff = pixOff + (height - 1 - y) * stride // un-flip
        var x = 0
        while (x < width) {
          val o = rowOff + 3 * x
          out(y * width + x) = ((bytes(o + 2) & 0xff) << 16) |
            ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
          x += 1
        }
        y += 1
      }
      DecodedImg(ok = true, width, height, out)
    }
  }

  /** Per-media decoded-image statistics row (all-integer so the
    * declared query is digit-exact against the oracle). */
  case class BmpStats(media_id: Long, n_bytes: Long, header_ok: Boolean,
      width: Long, height: Long, b_sum: Long, g_sum: Long, r_sum: Long,
      edges: Long)

  /** Encode the deterministic test image for `mediaId` (the same
    * closed form the DuckDB oracle replays), round-trip it through
    * [[BmpCodec]] and compute stats FROM THE DECODED PIXELS — the
    * Spark side exercises the real header + padded-BGR-row parse end
    * to end. Channels derive from the id FOLDED mod 251 before any
    * multiply (no overflow envelope); `edges` counts horizontal
    * luminance jumps > 128 (an integer gradient, so the value is
    * sensitive to pixel ORDER, not just content — a row-order or
    * stride bug in the decode flips it). */
  def bmpRoundTripStats(mediaId: Long): BmpStats = {
    val w = (8 + mediaId % 9).toInt
    val h = (8 + mediaId % 7).toInt
    val dd = (mediaId % 251).toInt
    def px(x: Int, y: Int): Int = {
      val b = (dd * 3 + x * 7 + y * 11) % 256
      val g = (dd * 5 + x * 13 + y * 3) % 256
      val r = (dd * 7 + x * 2 + y * 17) % 256
      (r << 16) | (g << 8) | b
    }
    val pixels = Array.tabulate(w * h)(i => px(i % w, i / w))
    val bytes = BmpCodec.encodeBgr24(w, h, pixels)
    val dec = BmpCodec.decodeBgr24(bytes)
    var bs = 0L; var gs = 0L; var rs = 0L; var edges = 0L
    var y = 0
    while (y < dec.height) {
      var x = 0
      var prevLum = -1
      while (x < dec.width) {
        val p = dec.pixels(y * dec.width + x)
        val b = p & 0xff; val g = (p >> 8) & 0xff; val r = (p >> 16) & 0xff
        bs += b; gs += g; rs += r
        val lum = b + g + r
        if (prevLum >= 0 && math.abs(lum - prevLum) > 128) edges += 1
        prevLum = lum
        x += 1
      }
      y += 1
    }
    BmpStats(mediaId, bytes.length.toLong, dec.ok, dec.width.toLong,
      dec.height.toLong, bs, gs, rs, edges)
  }

  /** Per-media decoded-audio statistics row (all-integer so the
    * declared query is digit-exact against the oracle). */
  case class WavStats(media_id: Long, n_bytes: Long, header_ok: Boolean,
      sample_rate: Long, n_samples: Long, peak_abs: Long, sum_sq: Long,
      zero_crossings: Long)

  /** Encode the deterministic test waveform for `mediaId` (the same
    * closed form the DuckDB oracle replays), then round-trip it
    * through [[WavCodec]] and compute stats FROM THE DECODED BYTES —
    * the Spark side exercises the real header+PCM parse end to end. */
  def wavRoundTripStats(mediaId: Long, sampleRate: Int): WavStats = {
    val n = (64 + mediaId % 64).toInt
    // fold the id into the modulus BEFORE multiplying (ADVICE r11):
    // (id % 2001) * 31 ≡ id * 31 (mod 2001) for non-negative ids, so
    // the waveform is unchanged, but the intermediate never exceeds
    // ~64k — no Long-overflow envelope (Spark wraps, DuckDB errors)
    val samples = Array.tabulate(n)(i =>
      ((mediaId % 2001) * 31 + i.toLong * 17) % 2001 - 1000)
      .map(_.toShort)
    val bytes = WavCodec.encodePcm16(samples, sampleRate)
    val dec = WavCodec.decodePcm16(bytes)
    var peak = 0L; var sumSq = 0L; var zc = 0L
    var i = 0
    while (i < dec.samples.length) {
      val s = dec.samples(i).toLong
      if (math.abs(s) > peak) peak = math.abs(s)
      sumSq += s * s
      if (i > 0 && ((dec.samples(i - 1) < 0) != (s < 0))) zc += 1
      i += 1
    }
    WavStats(mediaId, bytes.length.toLong, dec.ok, dec.sampleRate.toLong,
      dec.samples.length.toLong, peak, sumSq, zc)
  }

  /** "Resize": renormalize a feature vector to a target dimension by
    * averaging buckets — the plumbing for a real resample kernel. */
  def resizeFeatures(features: DataFrame, targetDim: Int): DataFrame =
    features.withColumn("resized", expr(
      s"""transform(sequence(0, $targetDim - 1), b ->
            aggregate(filter(transform(sequence(0, size(features) - 1),
                i -> struct(i AS i, element_at(features, i + 1) AS v)),
                s -> s.i % $targetDim = b),
              cast(0.0 AS float), (acc, s) -> acc + s.v))"""))
}
