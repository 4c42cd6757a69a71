package graft.engine.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.10 north star): media travel
  * as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run as partition-local
  * batch transforms.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] derives deterministic pseudo-features from
  * the bytes. Everything around it — schema, encoders, partition-local
  * batching, the operator signatures — is the real Spark shape: swap
  * `FakeCodec` for a JNI/library codec and the pipeline is production.
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
