package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support [EXT] (north_star "multimodal columns"):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / frame-sample operators.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * codecs — see `StubDecoder`): the stub is a deterministic function of
  * the bytes, while the Spark-side plumbing — binary schema, batch
  * shape, partition-parallel mapPartitions, typed output structs — is
  * real and tested. Swapping `StubDecoder` for a JNI/javacv decoder is a
  * one-object change.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      n_frames: Long)

  /** `frame_bytes` is a comma-joined preview string (not an array):
    * the driver's correctness compare can't sort array cells. */
  final case class FrameSample(doc_id: Long, n_frames: Long, frame_bytes: String)

  /** Attach a binary payload column + typed metadata to `documents`
    * (payload = UTF-8 bytes of the text — the testdata has no real
    * media; at ingest this column would come from S3 object bytes). */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_type",
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("width", (pmod(col("n_chars"), lit(640)) + 1).cast("long"))
      .withColumn("height", (pmod(col("doc_id"), lit(480)) + 1).cast("long"))

  /** STUB media decoder — deterministic fake standing in for a real
    * codec. Real implementation decodes image dims / audio samples /
    * video frames from the payload bytes. */
  object StubDecoder extends Serializable {
    val FrameStride = 256
    def meanByte(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    def frameCount(bytes: Array[Byte]): Long =
      (bytes.length + FrameStride - 1) / FrameStride
    /** "Frame" = one sampled byte per stride (a real decoder returns
      * decoded frame tensors here). */
    def sampleFrames(bytes: Array[Byte]): Seq[Long] =
      bytes.indices.by(FrameStride).map(i => (bytes(i) & 0xff).toLong)
    /** Resample stub for the resize path: sum of every stride-th byte
      * (stride = max(1, n/16) → ≤17 samples per payload). */
    def strideChecksum(bytes: Array[Byte]): Long = {
      if (bytes.isEmpty) 0L
      else {
        val stride = math.max(1, bytes.length / 16)
        bytes.indices.by(stride).foldLeft(0L)((a, i) => a + (bytes(i) & 0xff))
      }
    }
  }

  final case class ResizedMedia(
      doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, n_out_bytes: Long, checksum: Long)

  /** Image resize (vision-model preprocessing): aspect-preserving fit
    * into a `target`×`target` box with exact integer math (long side →
    * target, short side → floor(short·target/long), floored at 1 —
    * deterministic across engines, no float scale factor), then the
    * stubbed resample pass over the payload. The resample stub reads
    * every stride-th byte (stride = max(1, n_bytes/16)) and checksums
    * them — standing in for a real bilinear kernel over decoded
    * pixels; a real decoder swaps in at [[StubDecoder]] with the
    * mapPartitions batch shape unchanged. */
  def resizeImages(spark: SparkSession, docs: DataFrame,
      target: Int = 224): Dataset[ResizedMedia] = {
    import spark.implicits._
    withMediaColumns(docs)
      .filter(col("media_type") === "image")
      .select(col("doc_id"), col("width"), col("height"), col("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        val dec = StubDecoder // one decoder per partition
        rows.map { case (id, w, h, bytes) =>
          val (ow, oh) =
            if (w >= h) (target.toLong, math.max(1L, h * target / w))
            else (math.max(1L, w * target / h), target.toLong)
          ResizedMedia(id, w, h, ow, oh, ow * oh,
            dec.strideChecksum(bytes))
        }
      }
  }

  /** Feature extraction over binary payloads: partition-parallel
    * mapPartitions (the batch shape a vectorized decoder wants — one
    * decoder instance per partition, not per row). */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withMediaColumns(docs)
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val dec = StubDecoder // one decoder per partition
        rows.map { case (id, mt, bytes) =>
          MediaFeatures(id, mt, bytes.length.toLong,
            dec.meanByte(bytes), dec.frameCount(bytes))
        }
      }
  }

  /** Frame sampling (video path): every FrameStride-th byte stands in
    * for a decoded frame. */
  def sampleFrames(spark: SparkSession, docs: DataFrame): Dataset[FrameSample] = {
    import spark.implicits._
    withMediaColumns(docs)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val dec = StubDecoder
        rows.map { case (id, bytes) =>
          val fr = dec.sampleFrames(bytes)
          FrameSample(id, fr.length.toLong, fr.take(5).mkString(","))
        }
      }
  }
}
