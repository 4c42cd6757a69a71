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

    def decodePcm16(bytes: Array[Byte]): Decoded = {
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE" ||
          tag(12) != "fmt " || tag(36) != "data")
        return Decoded(ok = false, 0, 0, 0, Array.empty)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val fmt = bb.getShort(20)
      val channels = bb.getShort(22)
      val rate = bb.getInt(24)
      val bits = bb.getShort(34)
      val dataLen = bb.getInt(40)
      if (fmt != 1 || bits != 16 || channels != 1 ||
          44 + dataLen != bytes.length || dataLen % 2 != 0)
        return Decoded(ok = false, rate, channels, bits, Array.empty)
      val out = new Array[Short](dataLen / 2)
      var i = 0
      while (i < out.length) {
        out(i) = bb.getShort(44 + 2 * i)
        i += 1
      }
      Decoded(ok = true, rate, channels, bits, out)
    }
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
    val samples = Array.tabulate(n)(i =>
      ((mediaId * 31 + i.toLong * 17) % 2001 - 1000).toShort)
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
