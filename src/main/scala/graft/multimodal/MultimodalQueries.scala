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
    Q("mm_features",
      None,
      (s, d) => Multimodal.extractFeatures(s, documents(s, d))
        .toDF().orderBy("doc_id")),

    // stubbed frame sampling over the video subset.
    Q("mm_frames",
      None,
      (s, d) => Multimodal.sampleFrames(s, documents(s, d))
        .toDF().orderBy("doc_id"))
  )
}
