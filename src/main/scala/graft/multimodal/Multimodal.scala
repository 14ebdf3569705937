package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support [EXT] (north_star "multimodal columns"):
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The image and audio paths run REAL codecs from the public JDK —
  * `javax.imageio.ImageIO` parses BMP payloads (file header, info
  * header, bottom-up padded BGR rows), `javax.sound.sampled
  * .AudioSystem` parses WAV/PCM payloads (RIFF chunks, format block,
  * frame count) — over synthetic media generated per document
  * ([[SynthMedia]]: deterministic pixel/sample formulas, so the DuckDB
  * oracle can recompute every decoded quantity in closed form and the
  * decode round-trip is hash-gated end-to-end). Video has no codec in
  * the JDK (and this container is zero-egress), so the video path
  * keeps the documented byte-stride frame sampling over the raw
  * payload — the one stub left, stated as such.
  *
  * Scale shape everywhere: decode runs in `mapPartitions` with one
  * codec instance per PARTITION (the batch shape a vectorized decoder
  * wants), payloads stay opaque binary until the decode boundary, and
  * nothing shuffles pixel data — per-doc stats leave the partition as
  * a handful of longs.
  */
object Multimodal {

  /** Deterministic synthetic media per document — the payload
    * GENERATOR (stands in for S3 object bytes at ingest; the testdata
    * has no real media). Every formula is integer arithmetic on
    * (doc_id, n_chars), so the oracle can recompute decoded values
    * without a codec:
    *
    *  - image (doc_id % 3 = 0): w×h 24-bit BMP, w = n_chars % 64 + 1,
    *    h = doc_id % 48 + 1, gray pixel v(x,y) = (doc_id + 7x + 13y)
    *    % 256 written to all three channels (BMP is lossless — decode
    *    returns these exact values);
    *  - audio (doc_id % 3 = 1): mono 8-bit unsigned PCM WAV at
    *    8 000 Hz, n = n_chars % 800 + 50 samples,
    *    s(i) = (7·doc_id + 31·i) % 256;
    *  - video (doc_id % 3 = 2): the UTF-8 text bytes (opaque payload —
    *    no JDK video codec; see the object scaladoc).
    */
  object SynthMedia extends Serializable {
    def imageDims(docId: Long, nChars: Long): (Int, Int) =
      ((nChars % 64 + 1).toInt, (docId % 48 + 1).toInt)
    def pixel(docId: Long, x: Int, y: Int): Int =
      ((docId + 7L * x + 13L * y) % 256).toInt
    def audioSamples(docId: Long, nChars: Long): Array[Int] =
      Array.tabulate((nChars % 800 + 50).toInt)(i =>
        ((7L * docId + 31L * i) % 256).toInt)

    def payload(docId: Long, text: String, nChars: Long): Array[Byte] =
      (docId % 3) match {
        case 0 =>
          val (w, h) = imageDims(docId, nChars)
          BmpCodec.encode(w, h, (x, y) => pixel(docId, x, y))
        case 1 => WavCodec.encode(audioSamples(docId, nChars), 8000)
        case _ => text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      }
  }

  /** Minimal 24-bit BMP writer — the synthetic ENCODER (deterministic
    * bytes: fixed 54-byte headers, bottom-up rows padded to 4 bytes,
    * BGR order). The DECODER is the real `javax.imageio` BMP reader;
    * encode→ImageIO.read round-trips losslessly, which is what lets
    * the decoded stats be oracle-exact. */
  object BmpCodec extends Serializable {
    def rowSize(w: Int): Int = (3 * w + 3) & ~3
    def fileSize(w: Int, h: Int): Int = 54 + rowSize(w) * h

    def encode(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val rs = rowSize(w)
      val out = java.nio.ByteBuffer.allocate(fileSize(w, h))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(fileSize(w, h))
        .putInt(0).putInt(54)                       // file header (14 B)
      out.putInt(40).putInt(w).putInt(h)            // info header (40 B)
        .putShort(1).putShort(24).putInt(0).putInt(rs * h)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var r = 0
      while (r < h) {                               // bottom-up rows
        val y = h - 1 - r
        var x = 0
        while (x < w) {
          val v = pix(x, y).toByte
          out.put(v).put(v).put(v)                  // B, G, R (gray)
          x += 1
        }
        var p = 3 * w
        while (p < rs) { out.put(0.toByte); p += 1 }
        r += 1
      }
      out.array()
    }

    /** One reusable BMP header reader — the per-PARTITION codec
      * instance of the metadata scan (a fresh `ImageIO` service
      * lookup per image costs more than parsing these headers; the
      * reader is stateful but re-targets via setInput). */
    def newMetaReader(): javax.imageio.ImageReader = {
      val rs = javax.imageio.ImageIO.getImageReadersByFormatName("bmp")
      require(rs.hasNext, "JDK BMP ImageReader missing")
      rs.next()
    }

    /** [[newMetaReader]] whose dispose() is tied to task completion:
      * an ImageReader holds native/stream resources that plain GC
      * reaps late, so every per-partition reader registers a
      * TaskContext completion hook (no-op off-executor, e.g. in unit
      * tests driving the lambda directly). */
    def partitionReader(): javax.imageio.ImageReader = {
      val r = newMetaReader()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => r.dispose()))
      r
    }

    /** HEADER-ONLY metadata parse via the javax.imageio reader API:
      * `ImageReader.getWidth/getHeight/getImageTypes` read the BMP
      * info header without decoding a single pixel row — the right
      * cost for a metadata scan over 100 TB of media (dims of a
      * gigapixel image cost the same as a thumbnail's). Still a REAL
      * parse of the container: a corrupt header throws. */
    def readMeta(r: javax.imageio.ImageReader,
        bytes: Array[Byte]): (Int, Int, Int) = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        r.setInput(iis)
        val ch = r.getImageTypes(0).next().getColorModel.getNumComponents
        (r.getWidth(0), r.getHeight(0), ch)
      } finally iis.close()
    }

    /** One-shot convenience spelling of [[readMeta]] (tests, single
      * payloads); hot paths hold a partition-scoped [[newMetaReader]]. */
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val r = newMetaReader()
      try readMeta(r, bytes) finally r.dispose()
    }

    /** REAL decode via javax.imageio against a partition-scoped
      * reader ([[newMetaReader]]): parses the BMP container and
      * returns (width, height, channels, gray pixels row-major
      * top-down). Throws on a corrupt payload — decode failures must
      * surface, not zero-fill. */
    def readImage(r: javax.imageio.ImageReader,
        bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        r.setInput(iis)
        val img = r.read(0)
        val (w, h) = (img.getWidth, img.getHeight)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        (w, h, img.getRaster.getNumBands, px)
      } finally iis.close()
    }

    /** One-shot convenience spelling of [[readImage]] (tests, single
      * payloads); hot paths hold a partition-scoped reader. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
      val r = newMetaReader()
      try readImage(r, bytes) finally r.dispose()
    }
  }

  /** Minimal WAV/PCM writer (RIFF + fmt + data chunks, mono unsigned
    * 8-bit) — decoded by the real `javax.sound.sampled` parser. */
  object WavCodec extends Serializable {
    def fileSize(n: Int): Int = 44 + n

    def encode(samples: Array[Int], rate: Int): Array[Byte] = {
      val n = samples.length
      val out = java.nio.ByteBuffer.allocate(fileSize(n))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
        .putShort(1)                                // PCM
        .putShort(1)                                // mono
        .putInt(rate).putInt(rate)                  // byteRate = rate·1·1
        .putShort(1).putShort(8)                    // blockAlign, bits
      out.put("data".getBytes).putInt(n)
      samples.foreach(s => out.put((s & 0xff).toByte))
      out.array()
    }

    /** HEADER-ONLY metadata parse via `AudioSystem.getAudioFileFormat`:
      * reads the RIFF/fmt chunks (rate, channels, frame count) without
      * streaming the PCM data — the metadata-scan cost contract of
      * [[BmpCodec.decodeMeta]], for audio. */
    def decodeMeta(bytes: Array[Byte]): (Int, Int, Long) = {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      (ff.getFormat.getSampleRate.toInt, ff.getFormat.getChannels,
        ff.getFrameLength.toLong)
    }

    /** REAL decode via javax.sound.sampled: parses the RIFF container
      * and format chunk, returns (sampleRate, channels, samples as
      * unsigned ints). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        require(f.getSampleSizeInBits == 8 && f.getChannels == 1,
          s"unexpected PCM shape: $f")
        val raw = in.readAllBytes()
        (f.getSampleRate.toInt, f.getChannels, raw.map(_ & 0xff))
      } finally in.close()
    }
  }

  /** The synthetic MEDIA LAKE table: (doc_id, media_type, payload
    * BINARY) — media as opaque binary columns, the north-star
    * multimodal data model. Generated once per testdata generation
    * and STAGED as parquet (MultimodalQueries.stagedMediaPath); every
    * decode query then reads the binary column from parquet and
    * never touches document text — at 100 TB the payload column IS
    * the dataset (ingested object bytes), and decode operators must
    * work from it alone. */
  def synthMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, text, nc) =>
          val mt = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          (id, mt, SynthMedia.payload(id, text, nc))
        }
      }
      .toDF("doc_id", "media_type", "payload")
  }

  /** Attach the RAW ingest payload column + declared metadata to
    * `documents` — the pre-decode plane (content-addressed dedup
    * hashes THESE bytes; decode happens downstream). Payload here is
    * the UTF-8 text bytes for every row: `mm_dedup` dedups what was
    * ingested, before any codec touches it. */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_type",
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise(lit("video")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  final case class MediaMeta(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Long, height: Long, n_channels: Long,
      sample_rate: Long, n_frames: Long)

  /** Decoded media metadata — the real-codec upgrade of the old
    * declared-metadata stub: per doc the payload is SYNTHESIZED
    * ([[SynthMedia]]) and then genuinely PARSED (ImageIO reader API
    * for images, AudioSystem file-format parse for audio), and the
    * reported dims/channels/rate/frames are what the parser read out
    * of the container, not what the generator intended — a corrupt
    * round-trip would hash-mismatch the oracle.
    *
    * HEADER-ONLY by design: metadata never touches pixel rows or PCM
    * data ([[BmpCodec.decodeMeta]] / [[WavCodec.decodeMeta]]) — at
    * 100 TB the metadata scan's cost must be independent of media
    * size (a gigapixel image's dims cost a thumbnail's), and the
    * pixel-decoding paths ([[extractFeatures]], [[resizeImages]]) pay
    * the full decode only where the pixels are actually consumed.
    * Video rows report payload size and the byte-stride frame count
    * (no JDK video codec). */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val reader = BmpCodec.partitionReader() // one per partition, task-scoped dispose
        rows.map { case (id, mt, bytes) =>
          mt match {
            case "image" =>
              val (w, h, ch) = BmpCodec.readMeta(reader, bytes)
              MediaMeta(id, mt, bytes.length.toLong,
                w.toLong, h.toLong, ch.toLong, 0L, 1L)
            case "audio" =>
              val (rate, ch, frames) = WavCodec.decodeMeta(bytes)
              MediaMeta(id, mt, bytes.length.toLong,
                0L, 0L, ch.toLong, rate.toLong, frames)
            case _ =>
              MediaMeta(id, mt, bytes.length.toLong, 0L, 0L, 0L, 0L,
                (bytes.length + 255L) / 256L)
          }
        }
      }
  }

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_units: Long,
      mean_val: Double, min_val: Long, max_val: Long)

  /** Decoded content statistics — mean/min/max over the units the
    * CODEC emits (gray pixel values for images, PCM samples for
    * audio, raw payload bytes for video): integer sums in the JVM,
    * one double division at the end (both engines divide the same
    * exact integers). */
  def extractFeatures(spark: SparkSession,
      media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    def stats(id: Long, mt: String, vs: Array[Int]): MediaFeatures = {
      var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      vs.foreach { v => s += v; if (v < mn) mn = v; if (v > mx) mx = v }
      MediaFeatures(id, mt, vs.length.toLong,
        if (vs.isEmpty) 0.0 else s.toDouble / vs.length,
        if (vs.isEmpty) 0L else mn, if (vs.isEmpty) 0L else mx)
    }
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val reader = BmpCodec.partitionReader() // one per partition, task-scoped dispose
        rows.map { case (id, mt, bytes) =>
          mt match {
            case "image" =>
              val (_, _, _, px) = BmpCodec.readImage(reader, bytes)
              stats(id, mt, px)
            case "audio" =>
              val (_, _, samples) = WavCodec.decode(bytes)
              stats(id, mt, samples)
            case _ => stats(id, mt, bytes.map(_ & 0xff))
          }
        }
      }
  }

  /** `frame_bytes` is a comma-joined preview string (not an array):
    * the driver's correctness compare can't sort array cells. */
  final case class FrameSample(doc_id: Long, n_frames: Long, frame_bytes: String)

  /** Frame sampling (video path): every 256th payload byte stands in
    * for a decoded frame — the declared video stub (no JDK codec; the
    * mapPartitions batch shape is what a javacv decoder would drop
    * into). */
  def sampleFrames(spark: SparkSession, media: DataFrame): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val fr = bytes.indices.by(256).map(i => (bytes(i) & 0xff).toLong)
          FrameSample(id, fr.length.toLong, fr.take(5).mkString(","))
        }
      }
  }

  final case class PerceptualHash(
      doc_id: Long, phash_hi: Long, phash_lo: Long)

  /** Average-hash (aHash) perceptual fingerprint over DECODED pixels —
    * the standard image near-dup primitive (resize to 8×8, threshold
    * each cell against the mean, read the 64 bits): content-hash
    * dedup ([[withMediaColumns]] → mm_dedup) only catches BYTE-equal
    * media, while re-encoded/resized copies of the same picture land
    * on the same aHash. Exact integer end-to-end: the 8×8 reduction
    * is the same nearest-neighbor rule as [[resizeImages]]
    * (cell (x,y) reads source (x·w div 8, y·h div 8)), and the mean
    * threshold compares v·64 > Σ — no division, no float, so the
    * fingerprint is bit-identical across engines and partitionings.
    * Emitted as two 32-bit halves in BIGINTs (single-long packing
    * would need bit-63 sign wrap, which engines disagree on).
    * Scale shape: one decode pass, 16 bytes of fingerprint per image
    * cross the shuffle — never pixels. */
  def perceptualHashes(spark: SparkSession,
      media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val reader = BmpCodec.partitionReader() // one per partition, task-scoped dispose
        rows.map { case (id, bytes) =>
          val (w, h, _, px) = BmpCodec.readImage(reader, bytes)
          val cells = new Array[Long](64)
          var i = 0
          var s = 0L
          while (i < 64) {
            val v = px((i / 8) * h / 8 * w + (i % 8) * w / 8).toLong
            cells(i) = v; s += v; i += 1
          }
          var hi = 0L; var lo = 0L
          i = 0
          while (i < 64) {
            if (cells(i) * 64 > s) {
              if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            }
            i += 1
          }
          PerceptualHash(id, hi, lo)
        }
      }
  }

  final case class ResizedMedia(
      doc_id: Long, width: Long, height: Long,
      out_w: Long, out_h: Long, n_out_bytes: Long, checksum: Long)

  /** Image resize (vision-model preprocessing) over DECODED pixels:
    * aspect-preserving fit into a `target`×`target` box with exact
    * integer math (long side → target, short side →
    * floor(short·target/long), floored at 1), then a REAL
    * nearest-neighbor resample of the decoded gray plane — out pixel
    * (x, y) reads source (x·w div out_w, y·h div out_h) — checksummed
    * as the exact integer sum of resampled values. Deterministic
    * across engines (no float kernel), and the oracle recomputes the
    * same sum from the pixel formula. */
  def resizeImages(spark: SparkSession, media: DataFrame,
      target: Int = 224): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val reader = BmpCodec.partitionReader() // one per partition, task-scoped dispose
        rows.map { case (id, bytes) =>
          val (w, h, _, px) = BmpCodec.readImage(reader, bytes)
          val (ow, oh) =
            if (w >= h) (target, math.max(1, h * target / w))
            else (math.max(1, w * target / h), target)
          var sum = 0L
          var y = 0
          while (y < oh) {
            val sy = y * h / oh
            var x = 0
            while (x < ow) { sum += px(sy * w + x * w / ow); x += 1 }
            y += 1
          }
          ResizedMedia(id, w.toLong, h.toLong, ow.toLong, oh.toLong,
            ow.toLong * oh, sum)
        }
      }
  }
}
