package graft.sim

/** The ONE spelling of the exact-integer PQ pipeline as DuckDB CTEs,
  * parameterized on the TRAINING and ENCODING populations (both SQL
  * predicates over `vec_id`) — shared by the whole-corpus consumers
  * (sim_topk_pq / sim_pq_distortion / sim_recall_pq, rendered at
  * TRUE/TRUE) and the persisted-index lifecycle (pq_index_build /
  * pq_incremental / pq_index_append, which train on a BASE subset and
  * encode base or delta at that frozen codebook). Mirrors
  * [[Pq.codebookAndCodes]] + [[Pq.encodeAt]]: grid-quantized dims →
  * per-subspace seeded codebooks from the TRAINING rows (one exact
  * Lloyd update; sums stay HUGEINT = the Spark side's DECIMAL(38,0)
  * widening) → codes with exact encoding distortion for the ENCODING
  * rows.
  */
private[graft] object PqSql {

  /** CTE chain binding `d` (quantized sub-dims of train ∪ encode),
    * `cent2` (the base-trained codebook) and `codes` (the encode
    * population's codes) — names kept stable so the ADC fragments
    * ([[SimQueries]] pqAdcCtes) compose unchanged. */
  def pipelineCtes(trainPred: String, encodePred: String,
      dimsExtraPred: String = "FALSE"): String =
    s"""dims AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS ii,
       |         CAST(round(unnest(embedding) * 1e7) AS BIGINT) + 10000000 AS v
       |  FROM embeddings
       |  WHERE ($trainPred) OR ($encodePred) OR ($dimsExtraPred)),
       |d AS (SELECT vec_id, CAST((ii - 1) // 16 AS BIGINT) AS sub, ii AS i, v
       |      FROM dims),
       |seeds AS (SELECT vec_id,
       |            CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
       |          FROM embeddings WHERE $trainPred ORDER BY vec_id LIMIT 4),
       |init AS (SELECT d.sub, s.j, d.i, d.v AS cv
       |         FROM d JOIN seeds s USING (vec_id)),
       |a1d AS (SELECT d.vec_id, d.sub, c.j,
       |          CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS d2
       |        FROM d JOIN init c ON d.sub = c.sub AND d.i = c.i
       |        WHERE $trainPred
       |        GROUP BY 1, 2, 3),
       |a1 AS (SELECT vec_id, sub, j FROM (
       |         SELECT vec_id, sub, j,
       |           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn
       |         FROM a1d) t WHERE rn = 1),
       |upd AS (SELECT a1.sub, a1.j, d.i, sum(d.v) AS s, count(*) AS n
       |        FROM a1 JOIN d ON a1.vec_id = d.vec_id AND a1.sub = d.sub
       |        GROUP BY 1, 2, 3),
       |cent2 AS (SELECT sub, j, i, CAST((s - s % n) // n AS BIGINT) AS cv
       |          FROM upd),
       |encd AS (SELECT d.vec_id, d.sub, c.j,
       |          CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS d2
       |        FROM d JOIN cent2 c ON d.sub = c.sub AND d.i = c.i
       |        WHERE $encodePred
       |        GROUP BY 1, 2, 3),
       |codes AS (SELECT vec_id, sub, j AS code, d2 FROM (
       |            SELECT *,
       |              row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn
       |            FROM encd) t WHERE rn = 1)""".stripMargin

  /** The IVF coarse-quantizer + routing CTEs over a bound `dims`
    * (from [[pipelineCtes]]): exact-integer kmeans on the `pred`
    * population (seeds = the k lowest vec_ids, one Lloyd update with
    * truncating-division means, re-assign — the [[Clustering
    * .kmeansFull]] recipe, same text as SimQueries' kmeansCte modulo
    * the shared `dims` source), then the query vector (lowest vec_id
    * of `pred`) probes its `nprobe` nearest cells and `cand` is the
    * probed cells' member vectors — exactly [[PqIndex.topKRouted]]'s
    * candidate set, so the routed serving path is hash-gated end to
    * end (cell training, assignment, probe choice, and the pruned ADC
    * all at once). */
  def coarseCtes(pred: String, k: Int, nprobe: Int): String =
    s"""km_init AS (
       |  SELECT d.ii AS i, d.v AS cv, r.j FROM dims d
       |  JOIN (SELECT vec_id,
       |          CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
       |        FROM embeddings WHERE $pred ORDER BY vec_id LIMIT $k) r
       |    USING (vec_id)),
       |km_d1 AS (
       |  SELECT d.vec_id, c.j,
       |         CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS d2
       |  FROM dims d JOIN km_init c ON d.ii = c.i
       |  WHERE $pred GROUP BY 1, 2),
       |km_a1 AS (SELECT vec_id, j FROM (
       |            SELECT vec_id, j,
       |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
       |            FROM km_d1) t WHERE rn = 1),
       |km_upd AS (
       |  SELECT a.j, d.ii AS i, CAST(sum(d.v) AS BIGINT) AS s, count(*) AS n
       |  FROM km_a1 a JOIN dims d USING (vec_id) GROUP BY 1, 2),
       |km_cent2 AS (SELECT j, i, CAST((s - s % n) // n AS BIGINT) AS cv
       |             FROM km_upd),
       |km_d2 AS (
       |  SELECT d.vec_id, c.j,
       |         CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS d2
       |  FROM dims d JOIN km_cent2 c ON d.ii = c.i
       |  WHERE $pred GROUP BY 1, 2),
       |km_a2 AS (SELECT vec_id, j FROM (
       |            SELECT vec_id, j,
       |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
       |            FROM km_d2) t WHERE rn = 1),
       |km_probe AS (
       |  SELECT c.j FROM km_cent2 c
       |  JOIN dims d ON c.i = d.ii
       |  WHERE d.vec_id = (SELECT min(vec_id) FROM embeddings WHERE $pred)
       |  GROUP BY c.j
       |  ORDER BY CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT), c.j
       |  LIMIT $nprobe),
       |cand AS (SELECT vec_id FROM km_a2
       |         WHERE j IN (SELECT j FROM km_probe))""".stripMargin

  /** The BATCHED routed-serving CTEs ([[PqIndex.topKRoutedBatch]]):
    * needs the km training CTEs (render [[coarseCtes]] first — its
    * km_probe/cand single-query tail is simply unused) and a
    * `dims`/`d` that INCLUDES the query population
    * ([[pipelineCtes]]'s dimsExtraPred). Per query: the nprobe
    * nearest cells by exact grid distance (ties to the lowest cell),
    * candidates = those cells' members, ADC lookup-sum, rank ≤ k with
    * ties on vec_id — the whole routed path from raw embeddings, per
    * query. Binds `served(q_id, rank, vec_id, approx_d2)`. */
  def routedBatchCtes(queryPred: String, k: Int, nprobe: Int): String =
    s"""qpc AS (SELECT q_id, j AS cell FROM (
       |          SELECT d.vec_id AS q_id, c.j,
       |            row_number() OVER (PARTITION BY d.vec_id
       |              ORDER BY CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT),
       |                       c.j) AS rn
       |          FROM dims d JOIN km_cent2 c ON d.ii = c.i
       |          WHERE $queryPred
       |          GROUP BY d.vec_id, c.j) t WHERE rn <= $nprobe),
       |qdb AS (SELECT d.vec_id AS q_id, c.sub, c.j,
       |          CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS qd2
       |        FROM d JOIN cent2 c ON d.sub = c.sub AND d.i = c.i
       |        WHERE $queryPred GROUP BY 1, 2, 3),
       |candb AS (SELECT p.q_id, a.vec_id FROM qpc p
       |          JOIN km_a2 a ON a.j = p.cell
       |          WHERE a.vec_id <> p.q_id),
       |adcb AS (SELECT cb.q_id, codes.vec_id,
       |           CAST(sum(qd.qd2) AS BIGINT) AS approx_d2
       |         FROM codes
       |         JOIN candb cb ON codes.vec_id = cb.vec_id
       |         JOIN qdb qd ON qd.q_id = cb.q_id AND qd.sub = codes.sub
       |                    AND qd.j = codes.code
       |         GROUP BY 1, 2),
       |served AS (SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
       |             approx_d2
       |           FROM (SELECT q_id, vec_id, approx_d2,
       |                   row_number() OVER (PARTITION BY q_id
       |                     ORDER BY approx_d2, vec_id) AS rank
       |                 FROM adcb) t
       |           WHERE rank <= $k)""".stripMargin

  /** The ADC fragments (query distance table + lookup-sum) over a
    * bound `d`/`cent2`/`codes`/`cand` — the query vector is the
    * LOWEST vec_id of the `queryPred` population (TRUE = the
    * whole-corpus consumers' spelling; the persisted-index query
    * serves from its base population). */
  def adcCtes(queryPred: String): String =
    s"""qd AS (SELECT c.sub, c.j,
       |         CAST(sum((d.v - c.cv) * (d.v - c.cv)) AS BIGINT) AS qd2
       |       FROM d JOIN cent2 c ON d.sub = c.sub AND d.i = c.i
       |       WHERE d.vec_id = (SELECT min(vec_id) FROM embeddings
       |                         WHERE $queryPred)
       |       GROUP BY 1, 2),
       |adc AS (SELECT codes.vec_id, CAST(sum(qd.qd2) AS BIGINT) AS approx_d2
       |        FROM codes JOIN cand USING (vec_id)
       |                   JOIN qd ON codes.sub = qd.sub AND codes.code = qd.j
       |        WHERE codes.vec_id <> (SELECT min(vec_id) FROM embeddings
       |                               WHERE $queryPred)
       |        GROUP BY 1)""".stripMargin
}
