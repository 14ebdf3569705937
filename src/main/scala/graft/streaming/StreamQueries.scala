package graft.streaming

import graft.Q
import graft.io.Tables._

/** Registered streaming queries. The tumbling/sliding aggregations run
  * through an actual Structured Streaming query (readStream →
  * AvailableNow → memory sink) and are oracle-checked against the
  * equivalent batch SQL — streaming/batch result parity is exactly what
  * Structured Streaming guarantees.
  */
object StreamQueries {

  def queries: Seq[Q] = Seq(
    Q("stream_window_agg",
      Some("""SELECT date_trunc('hour', ts) AS ws,
             |       count(*) AS n,
             |       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Streams.hourlyEventAgg(s, d)),

    // append-mode variant: only windows the final watermark
    // (max ts − 1 h) has passed are emitted; open windows stay withheld.
    Q("stream_append_window_agg",
      Some("""SELECT ws, n FROM (
             |  SELECT date_trunc('hour', ts) AS ws, count(*) AS n
             |  FROM events GROUP BY 1) t
             |WHERE ws + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
             |ORDER BY ws""".stripMargin),
      (s, d) => Streams.hourlyEventAggAppend(s, d)),

    // the production FILE SINK: append-mode aggregates land as parquet
    // with the sink's _spark_metadata transaction log; the read-back
    // honors the log, so the write is exactly-once end to end.
    Q("stream_file_sink",
      Some("""SELECT ws, n FROM (
             |  SELECT date_trunc('hour', ts) AS ws, count(*) AS n
             |  FROM events GROUP BY 1) t
             |WHERE ws + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
             |ORDER BY ws""".stripMargin),
      (s, d) => Streams.fileSinkHourlyCounts(s, d)),

    Q("stream_chained_windows",
      Some("""WITH h AS (SELECT date_trunc('hour', ts) AS hs, count(*) AS n
             |          FROM events GROUP BY 1),
             |d AS (SELECT CAST(date_trunc('day', hs) AS TIMESTAMP) AS ds, max(n) AS max_hourly,
             |             CAST(sum(n) AS BIGINT) AS total
             |      FROM h GROUP BY 1)
             |SELECT ds, max_hourly, total FROM d
             |WHERE ds + INTERVAL 1 DAY <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
             |ORDER BY ds""".stripMargin),
      (s, d) => Streams.chainedWindowAgg(s, d)),

    Q("stream_sliding_window",
      // a 1h-window/30m-slide event belongs to exactly two windows:
      // the one starting at its 30-min bucket and the one 30 min before.
      Some("""SELECT ws, event_type, count(*) AS n FROM (
             |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type FROM events
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type
             |  FROM events) t
             |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin),
      (s, d) => Streams.slidingEventCounts(s, d)),

    // streaming exact dedup (dropDuplicates within the watermark) —
    // event_ids are unique in the snapshot, so the deduped counts equal
    // the plain counts.
    Q("stream_dedup",
      Some("""SELECT event_type, count(DISTINCT event_id) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Streams.dedupedEventCounts(s, d)),

    // streaming dedup with GUARANTEED watermark-bounded state
    // (dropDuplicatesWithinWatermark — the bounded-state variant).
    Q("stream_dedup_within_wm",
      Some("""SELECT event_type, count(DISTINCT event_id) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Streams.dedupedWithinWatermarkCounts(s, d)),

    // UPDATE output mode across two micro-batches (evens then odds):
    // the sink records every per-batch update; counts are monotone so
    // max() per window is the final value = the batch aggregation.
    Q("stream_window_update",
      Some("""SELECT date_trunc('hour', ts) AS ws, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Streams.hourlyCountsUpdateMode(s, d)),

    // checkpointed foreachBatch parquet sink run twice against one
    // checkpoint — the restart lands nothing twice (exactly-once), so
    // the sink contents equal the source.
    Q("stream_upsert_state",
      Some("""SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             |       value AS last_value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rk FROM events) t
             |WHERE rk = 1 ORDER BY user_id""".stripMargin),
      (s, d) => Streams.upsertLatestState(s, d)),

    Q("stream_sink_exactly_once",
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Streams.exactlyOnceSinkCounts(s, d)),

    // watermark LATE-DATA DROP (see Streams.lateDropHourlyCounts for
    // the 3-batch arrival choreography): on-time rows (evens + the last
    // 3 h) are counted; the purely-late odd rows arrive after their
    // windows were evicted and are dropped. Emitted windows are those
    // the final watermark (max ts − 1 h) passed — append mode, as in
    // stream_append_window_agg.
    Q("stream_late_drop",
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events),
             |kept AS (
             |  SELECT date_trunc('hour', ts) AS ws FROM events, mx
             |  WHERE event_id % 2 = 0 OR ts >= mx.m - INTERVAL 3 HOUR)
             |SELECT ws, count(*) AS n FROM kept, mx
             |WHERE ws + INTERVAL 1 HOUR <= mx.m - INTERVAL 1 HOUR
             |GROUP BY ws ORDER BY ws""".stripMargin),
      (s, d) => Streams.lateDropHourlyCounts(s, d)),

    // stream-stream join with watermark-bounded state.
    Q("stream_stream_join",
      Some("""SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id AS p_user
             |FROM events p JOIN events v
             |  ON p.event_type = 'purchase' AND v.event_type = 'view'
             | AND v.user_id = p.user_id
             | AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
             |ORDER BY p_id, v_id""".stripMargin),
      (s, d) => Streams.purchaseViewJoin(s, d)),

    // un-windowed global running aggregate, complete mode: the
    // always-current totals table (state = |distinct keys|, not
    // history) every live dashboard sits on.
    Q("stream_global_agg",
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Streams.globalTypeTotals(s, d)),

    // stream-stream LEFT OUTER join: unmatched purchases surface with
    // NULL view only after watermark-driven state eviction (sentinel
    // choreography flushes the tail — see Streams.purchaseViewLeftJoin).
    Q("stream_stream_left_join",
      Some("""SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id AS p_user
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             |  ON v.user_id = p.user_id
             | AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
             |ORDER BY p_id, v_id""".stripMargin),
      (s, d) => Streams.purchaseViewLeftJoin(s, d)),

    // stream-stream FULL OUTER join: null-padded unmatched rows from
    // BOTH sides on watermark eviction.
    Q("stream_stream_full_join",
      Some("""SELECT p.event_id AS p_id, v.event_id AS v_id,
             |       coalesce(p.user_id, v.user_id) AS u
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
             |  ON v.user_id = p.user_id
             | AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 1 HOUR
             |ORDER BY p_id, v_id""".stripMargin),
      (s, d) => Streams.purchaseViewFullJoin(s, d)),

    // stream-static broadcast-enrichment join.
    Q("stream_static_join",
      Some("""SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
             |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
             |WHERE e.event_type = 'purchase' ORDER BY e.event_id""".stripMargin),
      (s, d) => Streams.enrichedPurchases(s, d)),

    // transformWithState (Spark 4's arbitrary-state successor API):
    // named ValueState counter per event_type on RocksDB state store.
    Q("stream_tws_counts",
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => Stateful.typeCountsTws(s, d)),

    // custom per-key state machine via mapGroupsWithState (update mode;
    // counters are monotone, so max() collapses multi-batch emissions to
    // the final value). total_value is float-accumulated → excluded.
    Q("stream_user_stats",
      Some("""SELECT user_id,
             |       count(*) AS n_events,
             |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_purchases
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.functions.{col, max}
        Stateful.userStats(s, d).toDF()
          .groupBy("user_id")
          .agg(max(col("n_events")).as("n_events"),
            max(col("n_purchases")).as("n_purchases"))
          .orderBy("user_id")
      }),

    // flatMapGroupsWithState: one output row PER SESSION (the 0..n
    // emission shape); oracle replays the gap-split with window SQL.
    Q("stream_flatmap_sessions",
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
             |              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
             |              ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts,
             |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS sess
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
             |FROM s GROUP BY user_id, sess
             |ORDER BY user_id, session_start""".stripMargin),
      (s, d) => Stateful.userSessions(s, d).toDF()
        .orderBy("user_id", "session_start")),

    // sessionization: 30-min-gap session windows per user.
    Q("stream_sessions",
      Some("""WITH g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |                THEN 1
             |              WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                   > INTERVAL 30 MINUTE THEN 1
             |              ELSE 0 END AS brk
             |  FROM events)
             |SELECT user_id,
             |       CAST(sum(brk) AS BIGINT) AS n_sessions,
             |       count(*) AS n_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Streams.sessionCounts(events(s, d)).orderBy("user_id")),

    // STREAMING session_window in append mode: sessions emit once their
    // end (last event + 30-min gap) falls behind the final watermark
    // (max ts − 1 h); still-open or too-recent sessions stay withheld.
    Q("stream_session_window",
      Some("""WITH g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
             |              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
             |              ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (
             |  SELECT user_id, ts,
             |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
             |  FROM g)
             |SELECT user_id, session_start, session_end, n_events FROM (
             |  SELECT user_id,
             |         min(ts) AS session_start,
             |         max(ts) + INTERVAL 30 MINUTE AS session_end,
             |         count(*) AS n_events
             |  FROM s GROUP BY user_id, sid) t
             |WHERE session_end <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
             |ORDER BY user_id, session_start""".stripMargin),
      (s, d) => Streams.streamingSessionWindows(s, d)),

    // CONTINUOUS INGESTION through the persisted dedup index: three
    // document "days" stream in (one micro-batch each); foreachBatch
    // screens each against the persisted index and appends only the
    // ACCEPTED rows' entries, so day N+1 probes an index grown by day
    // N (see Streams.indexIngestAccepted). The oracle replays the
    // sequential fold with exact all-pairs Jaccard: a day's doc is
    // rejected iff it near-dups (J ≥ 0.7) an indexed doc — base or a
    // PRIOR day's accepted doc — or a lower-id same-day doc; rejected
    // docs never enter the index, so they don't block later days.
    // Oracle-exact for the dedup_minhash reasons (verified-100% LSH
    // recall on this corpus, bucket cutoffs never fire).
    Q("stream_index_ingest",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |jp AS (SELECT ia, ib FROM pairs
             |       JOIN sizes sa ON sa.doc_id = pairs.ia
             |       JOIN sizes sb ON sb.doc_id = pairs.ib
             |       WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7),
             |e AS (SELECT ia AS a, ib AS b FROM jp
             |      UNION SELECT ib AS a, ia AS b FROM jp),
             |rej1 AS (SELECT DISTINCT a AS doc_id FROM e
             |         WHERE a % 4 = 1
             |           AND (b % 4 = 0 OR (b % 4 = 1 AND b < a))),
             |acc1 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 1
             |         AND doc_id NOT IN (SELECT doc_id FROM rej1)),
             |rej2 AS (SELECT DISTINCT a AS doc_id FROM e
             |         WHERE a % 4 = 2
             |           AND (b % 4 = 0
             |                OR b IN (SELECT doc_id FROM acc1)
             |                OR (b % 4 = 2 AND b < a))),
             |acc2 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 2
             |         AND doc_id NOT IN (SELECT doc_id FROM rej2)),
             |rej3 AS (SELECT DISTINCT a AS doc_id FROM e
             |         WHERE a % 4 = 3
             |           AND (b % 4 = 0
             |                OR b IN (SELECT doc_id FROM acc1)
             |                OR b IN (SELECT doc_id FROM acc2)
             |                OR (b % 4 = 3 AND b < a))),
             |acc3 AS (SELECT doc_id FROM documents WHERE doc_id % 4 = 3
             |         AND doc_id NOT IN (SELECT doc_id FROM rej3))
             |SELECT doc_id, CAST(1 AS BIGINT) AS day FROM acc1
             |UNION ALL
             |SELECT doc_id, CAST(2 AS BIGINT) AS day FROM acc2
             |UNION ALL
             |SELECT doc_id, CAST(3 AS BIGINT) AS day FROM acc3
             |ORDER BY day, doc_id""".stripMargin),
      (s, d) => Streams.indexIngestAccepted(s, d)),

    // STREAMED text near-dup lookup — the FIRST family's online READ
    // path (Streams.textIndexServing), completing the serving column
    // across all four persisted index families: document
    // micro-batches answered by Dedup.lookupReport against the SHARED
    // staged % 5 ≠ 0 index, one verdict row per document, landed
    // exactly-once. The lookup posture has NO intra-delta blocking
    // (dup ⇔ near-dups SOME indexed doc — a pure per-document
    // function, so verdicts are batch-composition invariant;
    // StreamingSpec pins micro-batched ≡ one-shot). Oracle: the
    // fp-screened residual spelling — delta docs collapse to one
    // representative per distinct shingle set, dup ⇔ the set equals
    // an indexed set (the fp short-circuit) or its representative
    // holds a J ≥ 0.7 edge to a BASE representative; the verdict then
    // propagates to every member by key. Oracle-exact for the
    // dedup_minhash reasons (verified-100% LSH recall on this corpus,
    // bucket cutoffs never fire).
    Q("stream_text_serving",
      Some(s"""${graft.text.DedupQueries.jaccardResidualCte(
                 "doc_id % 5 <> 0", "doc_id % 5 = 0")},
             |jp AS (SELECT ia, ib FROM pairs
             |       JOIN sizes sa ON sa.doc_id = pairs.ia
             |       JOIN sizes sb ON sb.doc_id = pairs.ib
             |       WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7),
             |rej AS (SELECT ib AS doc_id FROM jp
             |        WHERE ib % 5 = 0 AND ia % 5 <> 0
             |        UNION
             |        SELECT ia AS doc_id FROM jp
             |        WHERE ia % 5 = 0 AND ib % 5 <> 0),
             |v AS (SELECT dg.key,
             |        (EXISTS (SELECT 1 FROM bfp WHERE bfp.key = dg.key)
             |         OR dg.md IN (SELECT doc_id FROM rej)) AS dup
             |      FROM dg)
             |SELECT f.doc_id, CAST(len(f.sh) AS BIGINT) AS n_shingles,
             |       md5(array_to_string(f.key, chr(31))) AS sh_fp, v.dup
             |FROM f JOIN v ON v.key = f.key
             |WHERE f.doc_id % 5 = 0
             |ORDER BY doc_id""".stripMargin),
      (s, d) => Streams.textIndexServing(s, d)),

    // the embedding half of the SAME ingest choreography: three
    // vector "days" fold through the persisted band index at the
    // day-0 MANIFEST width (deltas never re-resolve it). Registered
    // at the ≤6400-vector gate floor (8 bits); graft.Verify re-renders
    // at the width the day-0 base actually resolves on bigger corpora
    // (SimQueries.resolvedBandedOracles), like the rest of the banded
    // family.
    Q("stream_emb_ingest",
      Some(graft.sim.EmbIndexQueries.ingestOracles(8)("stream_emb_ingest")),
      (s, d) => Streams.embIndexIngestAccepted(s, d)),

    // the ONLINE READ path: continuous top-k serving from the SHARED
    // staged band index (read-only — no per-run root needed). A
    // stream of query vectors, three micro-batches, each answered via
    // EmbIndex.indexTopKBatch and landed exactly-once; serving is
    // stateless reads, so the result is batch-size invariant. The
    // oracle re-derives every ranked row at the manifest width
    // (registered in EmbIndexQueries.indexOracles so graft.Verify's
    // width override covers it like the rest of the % 5 family).
    Q("stream_emb_serving",
      Some(graft.sim.EmbIndexQueries.indexOracles(8)("stream_emb_serving")),
      (s, d) => Streams.embIndexServing(s, d)),

    // routed-PQ ONLINE serving — the third family's read path, and
    // the billion-vector steady state: query micro-batches are
    // ADC-ranked against ONLY their probed cells' code partitions of
    // the SHARED staged IVF-PQ index (stateless reads — batch splits
    // cannot change results, so the oracle treats all % 5 = 0 queries
    // as one batch and replays coarse training, per-query probe
    // choice, and the cell-restricted ADC from raw embeddings).
    Q("stream_pq_serving",
      Some(s"""WITH ${graft.sim.PqSql.pipelineCtes("vec_id % 5 <> 0",
                 "vec_id % 5 <> 0", "vec_id % 5 = 0")},
              |${graft.sim.PqSql.coarseCtes("vec_id % 5 <> 0",
                 graft.sim.PqIndex.KC, 2)},
              |${graft.sim.PqSql.routedBatchCtes("vec_id % 5 = 0", 3, 2)}
              |SELECT q_id, rank, vec_id, approx_d2 FROM served
              |ORDER BY q_id, rank""".stripMargin),
      (s, d) => Streams.pqIndexServing(s, d)),

    // the PQ third of the ingest choreography: day 0 trains the
    // codebook, streamed batches encode at it FROZEN and append
    // (exactly-once — a restarted batch never double-encodes). The
    // oracle trains on the % 4 = 0 base only and recomputes every
    // grown-artifact row, so a silent per-batch retrain (codes from
    // two codebooks in one artifact) hash-mismatches.
    Q("stream_pq_ingest",
      Some(s"""WITH ${graft.sim.PqSql.pipelineCtes("vec_id % 4 = 0", "TRUE")}
              |SELECT vec_id, sub, code, d2,
              |       CAST(vec_id % 4 AS BIGINT) AS day
              |FROM codes ORDER BY vec_id, sub""".stripMargin),
      (s, d) => Streams.pqIndexIngestCodes(s, d)),

    // MEDIA near-dup lookup SERVING — the fourth family's online READ
    // path (emb/pq twins above): micro-batches of planted near-dup
    // media are answered by the Hamming ≤ 3 band probe against the
    // SHARED staged signature index, verdicts landed exactly-once.
    // Serving runs withinDelta = false — a lookup is a pure
    // per-object function of the corpus, so verdicts are
    // batch-composition invariant and the oracle needs no batch
    // replay: it recomputes every planted fingerprint from the closed
    // forms and brute-forces Hamming ≤ 3 against the index only.
    Q("stream_mm_serving",
      Some(s"""WITH ${graft.multimodal.MultimodalQueries.mmSigCte},
             |${graft.multimodal.MultimodalQueries.mmNearDupCtes},
             |rej AS (SELECT DISTINCT d.doc_id FROM dp d JOIN ix b
             |          ON d.media_type = b.media_type
             |         AND bit_count(xor(d.phash_hi, b.phash_hi))
             |           + bit_count(xor(d.phash_lo, b.phash_lo)) <= 3)
             |SELECT doc_id, media_type, phash_hi, phash_lo,
             |       doc_id NOT IN (SELECT doc_id FROM rej) AS accepted
             |FROM dp ORDER BY doc_id""".stripMargin),
      (s, d) => Streams.mmIndexServing(s, d)),

    // the MEDIA fourth of the ingest choreography: three media "days"
    // fold through the persisted perceptual-hash index — each batch
    // is decoded ONCE, screened against the persisted signatures, and
    // only accepted objects' fingerprints appended (see
    // Streams.mmIndexIngestAccepted). The oracle replays the
    // sequential fold from the three modalities' closed pixel/sample
    // forms: a day's object is rejected iff its (media_type,
    // fingerprint) matches the base, a PRIOR day's accepted object,
    // or a lower-id same-day object — fingerprint equality is
    // transitive, so min-id-per-signature is the exact same-day rule.
    Q("stream_mm_ingest",
      Some(s"""WITH ${graft.multimodal.MultimodalQueries.mmSigCte},
             |s0 AS (SELECT DISTINCT media_type, phash_hi, phash_lo
             |       FROM p WHERE doc_id % 4 = 0),
             |g1 AS (SELECT media_type, phash_hi, phash_lo,
             |              min(doc_id) AS doc_id
             |       FROM p WHERE doc_id % 4 = 1 GROUP BY 1, 2, 3),
             |a1 AS (SELECT * FROM g1 WHERE NOT EXISTS (SELECT 1 FROM s0
             |       WHERE s0.media_type = g1.media_type
             |         AND s0.phash_hi = g1.phash_hi
             |         AND s0.phash_lo = g1.phash_lo)),
             |s1 AS (SELECT media_type, phash_hi, phash_lo FROM s0
             |       UNION SELECT media_type, phash_hi, phash_lo FROM a1),
             |g2 AS (SELECT media_type, phash_hi, phash_lo,
             |              min(doc_id) AS doc_id
             |       FROM p WHERE doc_id % 4 = 2 GROUP BY 1, 2, 3),
             |a2 AS (SELECT * FROM g2 WHERE NOT EXISTS (SELECT 1 FROM s1
             |       WHERE s1.media_type = g2.media_type
             |         AND s1.phash_hi = g2.phash_hi
             |         AND s1.phash_lo = g2.phash_lo)),
             |s2 AS (SELECT media_type, phash_hi, phash_lo FROM s1
             |       UNION SELECT media_type, phash_hi, phash_lo FROM a2),
             |g3 AS (SELECT media_type, phash_hi, phash_lo,
             |              min(doc_id) AS doc_id
             |       FROM p WHERE doc_id % 4 = 3 GROUP BY 1, 2, 3),
             |a3 AS (SELECT * FROM g3 WHERE NOT EXISTS (SELECT 1 FROM s2
             |       WHERE s2.media_type = g3.media_type
             |         AND s2.phash_hi = g3.phash_hi
             |         AND s2.phash_lo = g3.phash_lo))
             |SELECT doc_id, media_type, phash_hi, phash_lo,
             |       CAST(1 AS BIGINT) AS day FROM a1
             |UNION ALL
             |SELECT doc_id, media_type, phash_hi, phash_lo,
             |       CAST(2 AS BIGINT) AS day FROM a2
             |UNION ALL
             |SELECT doc_id, media_type, phash_hi, phash_lo,
             |       CAST(3 AS BIGINT) AS day FROM a3
             |ORDER BY day, doc_id""".stripMargin),
      (s, d) => Streams.mmIndexIngestAccepted(s, d)),

    // streaming expanding z-score: per-event anomaly vs the running
    // moments of all PRIOR events of that user (exact cent-integer
    // sums in flatMapGroupsWithState state). The oracle is the batch
    // expanding-window spelling of the identical integer closed form.
    Q("stream_zscore",
      Some("""WITH m AS (
             |  SELECT event_id, user_id,
             |         CAST(round(value * 100) AS BIGINT) AS v,
             |         count(*) OVER w AS n_prev,
             |         sum(CAST(round(value * 100) AS BIGINT)) OVER w AS s_prev,
             |         sum(CAST(round(value * 100) AS BIGINT)
             |             * CAST(round(value * 100) AS BIGINT)) OVER w AS s2_prev
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id,
             |       CASE WHEN n_prev >= 2
             |                 AND n_prev * s2_prev - s_prev * s_prev > 0
             |            THEN CAST(round((v * n_prev - s_prev)
             |                 / sqrt(CAST(n_prev * s2_prev - s_prev * s_prev AS DOUBLE))
             |                 * 1e6) AS BIGINT)
             |            ELSE NULL END AS z_micro
             |FROM m ORDER BY event_id""".stripMargin),
      (s, d) => Stateful.expandingZscores(s, d).toDF()
        .orderBy("event_id"))
  )
}
