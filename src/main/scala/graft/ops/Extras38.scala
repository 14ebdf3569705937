package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-36 operators: biggest-jump detection and chunk-level
  * dedup.
  */
object Extras38 {

  def queries: Seq[Q] = Seq(
    // biggest jump per series: the single largest absolute step
    // between consecutive readings, with the event where it landed —
    // the "what was the wildest move" drill-down next to CUSUM/bursts.
    // One lag window + one lexicographic struct-max reduction (the
    // argmax-without-a-join trick) on the same shuffle.
    Q("ts_biggest_jump",
      Some("""WITH l AS (SELECT user_id, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             lag(CAST(round(value * 100) AS BIGINT))
             |               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |           FROM events)
             |SELECT user_id,
             |       CAST(max(struct_pack(d := abs(c - prev), eid := event_id)).d
             |            AS BIGINT) AS max_jump_cents,
             |       CAST(max(struct_pack(d := abs(c - prev), eid := event_id)).eid
             |            AS BIGINT) AS at_event_id
             |FROM l WHERE prev IS NOT NULL
             |GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .withColumn("prev", lag("c", 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy("user_id")
          .agg(max(struct(abs(col("c") - col("prev")).as("d"),
            col("event_id").as("eid"))).as("m"))
          .select(col("user_id"),
            col("m.d").cast("long").as("max_jump_cents"),
            col("m.eid").cast("long").as("at_event_id"))
          .orderBy("user_id")
      }),

    // chunk-level exact dedup: after 32/16 chunking, identical chunk
    // TEXT survives only at its first (doc, idx) occurrence — the
    // second dedup pass real pipelines run after document-level dedup
    // (shared boilerplate shows up as repeated chunks even across
    // non-duplicate docs). Fingerprint keys keep the shuffle narrow;
    // the report counts survivors vs raw chunks.
    Q("dedup_chunks",
      Some("""WITH chunks AS (
             |  SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
             |         array_to_string(toks[ci*16+1 : ci*16+32], ' ') AS chunk_text
             |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS toks
             |        FROM documents) t,
             |       LATERAL unnest(range(CAST(ceil(greatest(len(toks) - 32, 0) / 16.0)
             |                            AS BIGINT) + 1)) u(ci)),
             |keep AS (SELECT md5(chunk_text) AS fp,
             |                min({'d': doc_id, 'c': chunk_idx}) AS fs,
             |                CAST(count(*) AS BIGINT) AS n_copies
             |         FROM chunks GROUP BY 1)
             |SELECT CAST((fs).d AS BIGINT) AS doc_id,
             |       CAST((fs).c AS BIGINT) AS chunk_idx,
             |       n_copies
             |FROM keep ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => {
        val toks = split(lower(trim(col("text"))), " +")
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"),
            // the ONE chunk-window definition (TextAnalysis) — and the
            // first-occurrence key is a lexicographic STRUCT min, not
            // the old doc_id*100000+chunk_idx packing, which silently
            // collided for documents with ≥1e5 chunks (~10 MB of text)
            // and overflowed for doc_id past 9.2e13 — with the oracle
            // sharing the formula, so the gate was blind to it
            posexplode(graft.text.TextAnalysis.chunkWindowsCol(col("toks"))))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            md5(concat_ws(" ", col("col"))).as("fp"))
          .groupBy("fp")
          .agg(min(struct(col("doc_id").as("d"),
            col("chunk_idx").cast("long").as("c"))).as("fs"),
            count(lit(1)).cast("long").as("n_copies"))
          .select(col("fs.d").as("doc_id"), col("fs.c").as("chunk_idx"),
            col("n_copies"))
          .orderBy("doc_id", "chunk_idx")
      }))
}
