package graft.multimodal

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Registered multimodal queries. Metadata is pure-Column (oracle-able);
  * decode/feature/frame paths run the stubbed decoder through real
  * mapPartitions plumbing (rows-only checks + unit tests). */
object MultimodalQueries {

  def queries: Seq[Q] = Seq(
    // typed media metadata over a binary payload column.
    Q("mm_meta",
      Some("""SELECT doc_id,
             |       CASE WHEN doc_id % 3 = 0 THEN 'image'
             |            WHEN doc_id % 3 = 1 THEN 'audio'
             |            ELSE 'video' END AS media_type,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |       CAST(n_chars % 640 + 1 AS BIGINT) AS width,
             |       CAST(doc_id % 480 + 1 AS BIGINT) AS height
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Multimodal.withMediaColumns(documents(s, d))
        .select("doc_id", "media_type", "n_bytes", "width", "height")
        .orderBy("doc_id")),

    // stubbed decode + feature extraction (mapPartitions, typed output).
    // Oracle-able because the corpus is pure ASCII (verified at every
    // SF): payload bytes == ord of chars, and mean_byte is an exact
    // integer sum divided once in double on both sides.
    Q("mm_features",
      Some("""SELECT doc_id,
             |       CASE WHEN doc_id % 3 = 0 THEN 'image'
             |            WHEN doc_id % 3 = 1 THEN 'audio'
             |            ELSE 'video' END AS media_type,
             |       CAST(length(text) AS BIGINT) AS n_bytes,
             |       CASE WHEN length(text) = 0 THEN 0.0
             |            ELSE CAST(list_aggregate(list_transform(range(length(text)),
             |                   i -> ord(text[i+1])), 'sum') AS DOUBLE) / length(text)
             |       END AS mean_byte,
             |       CAST((length(text) + 255) // 256 AS BIGINT) AS n_frames
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Multimodal.extractFeatures(s, documents(s, d))
        .toDF().orderBy("doc_id")),

    // stubbed frame sampling over the video subset (every 256th byte,
    // first 5 as a comma-joined preview).
    Q("mm_frames",
      Some("""SELECT doc_id,
             |       CAST((length(text) + 255) // 256 AS BIGINT) AS n_frames,
             |       array_to_string(list_transform(
             |         range(LEAST((length(text) + 255) // 256, 5)),
             |         i -> ord(text[i*256 + 1])), ',') AS frame_bytes
             |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin),
      (s, d) => Multimodal.sampleFrames(s, documents(s, d))
        .toDF().orderBy("doc_id")),

    // aspect-preserving image resize (vision-preprocessing plumbing):
    // exact integer target dims + the stubbed stride-resample checksum
    // through the same mapPartitions batch shape a real bilinear
    // kernel would use. Oracle-able for the same reason as
    // mm_features: the corpus is pure ASCII, so ord(text[i]) IS the
    // payload byte, and every other quantity is integer math.
    Q("mm_resize",
      Some("""WITH m AS (SELECT doc_id, text,
             |             CAST(n_chars % 640 + 1 AS BIGINT) AS width,
             |             CAST(doc_id % 480 + 1 AS BIGINT) AS height,
             |             length(text) AS nb
             |           FROM documents WHERE doc_id % 3 = 0),
             |r AS (SELECT doc_id, text, width, height, nb,
             |        CASE WHEN width >= height THEN CAST(224 AS BIGINT)
             |             ELSE GREATEST(1, width * 224 // height) END AS out_w,
             |        CASE WHEN width >= height
             |             THEN GREATEST(1, height * 224 // width)
             |             ELSE CAST(224 AS BIGINT) END AS out_h
             |      FROM m)
             |SELECT doc_id, width, height, out_w, out_h,
             |       CAST(out_w * out_h AS BIGINT) AS n_out_bytes,
             |       CAST(CASE WHEN nb = 0 THEN 0 ELSE
             |         list_aggregate(list_transform(
             |           range((nb + GREATEST(1, nb // 16) - 1) // GREATEST(1, nb // 16)),
             |           i -> ord(text[i * GREATEST(1, nb // 16) + 1])), 'sum')
             |       END AS BIGINT) AS checksum
             |FROM r ORDER BY doc_id""".stripMargin),
      (s, d) => Multimodal.resizeImages(s, documents(s, d))
        .toDF().orderBy("doc_id")),

    // content-addressed binary dedup: group payloads by sha2-256 —
    // the multimodal dedup primitive (image/audio blobs dedup by
    // content hash, never by byte comparison). The shuffle key is the
    // 32-byte digest, not the payload, so shuffled bytes stay tiny
    // however large the media column is. Corpus is ASCII, so DuckDB's
    // sha256(text) sees the same bytes as sha2(payload, 256).
    Q("mm_dedup",
      Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
             |       count(*) AS n_copies,
             |       CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
             |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin),
      (s, d) => Multimodal.withMediaColumns(documents(s, d))
        .groupBy(sha2(col("payload"), 256).as("content_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
          min("n_bytes").as("n_bytes"))
        .orderBy("keep_id"))
  )
}
