package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-29 operators: Theil-Sen robust slope and the LSH
  * recall report.
  */
object Extras31 {

  def queries: Seq[Q] = Seq(
    // Theil-Sen slope per user: the MEDIAN of all pairwise slopes
    // (Δcents/Δhours) — the robust trend line outliers cannot drag.
    // Each pairwise slope µ-rounds once (identical exact-integer
    // operands in both engines), then percentile_disc picks the lower
    // median ELEMENT — no interpolation arithmetic, engine-exact. The
    // pairwise expansion is keyed on the user (per-series quadratic,
    // the same documented cost class as Mann-Kendall).
    Q("stat_theil_sen",
      Some("""WITH v AS (SELECT user_id, epoch_us(ts) AS us,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             row_number() OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS i
             |           FROM events),
             |p AS (SELECT a.user_id,
             |        CAST(least(greatest(round((b.c - a.c) * 3600.0 * 1e6 * 1e6
             |             / (b.us - a.us)), -9e18), 9e18) AS BIGINT) AS slope_e6
             |      FROM v a JOIN v b ON a.user_id = b.user_id AND b.i > a.i
             |      WHERE b.us > a.us)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(quantile_disc(slope_e6, 0.5) AS BIGINT) AS ts_slope_e6
             |FROM p GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => {
        // r16 (guide §2.4/§2.5): the generic userPairs scaffold ranks
        // BOTH join sides by (ts, event_id) to impose pair order via
        // ib > ia — but this query ALSO requires ub > ua, and
        // unix_micros is strictly monotone in ts, so ub > ua alone
        // implies ib > ia (row_number orders by ts first): the rank
        // windows (an Exchange+Sort+Window on each join side) are
        // provably redundant here and are dropped. The surviving
        // probe side repartitions by user_id at an EXPLICIT width
        // (defaultParallelism — scale-adaptive, not a constant): the
        // input is ~30 bytes/row, so AQE's coalescing sees a few MB
        // of shuffle output and would fold the exchange to 1-3
        // partitions — serializing the k²-per-user pair explosion,
        // the slope kernel, AND the downstream median sort that reuse
        // this partitioning (the whole query ran ~single-threaded;
        // AQE prices the map output, not the 33× expansion above it).
        // Pair set, n_pairs and median are unchanged — same oracle.
        val v = Tables.events(s, d).select(col("user_id"),
          unix_micros(col("ts")).as("u"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        val a = v.select(col("user_id"), col("u").as("ua"), col("c").as("ca"))
          .repartition(s.sparkContext.defaultParallelism, col("user_id"))
        val b = v.select(col("user_id"), col("u").as("ub"), col("c").as("cb"))
        a.join(b, Seq("user_id"))
          .filter(col("ub") > col("ua"))
          .select(col("user_id"),
            // saturate at ±9e18: an adjacent-microsecond pair with a
            // >25.6-unit value delta yields a slope past BIGINT range,
            // and the unclamped CAST kills the whole run (ANSI/DuckDB
            // conversion error). The MEDIAN is unaffected unless more
            // than half of a user's pairs saturate — saturation keeps
            // the extreme tail's ORDER, which is all a median needs.
            expr("""CAST(least(greatest(round((cb - ca) * 3600.0 * 1e6 * 1e6
                   | / (ub - ua)), -9e18), 9e18) AS BIGINT)""".stripMargin)
              .as("slope_e6"))
          // Lower-median ELEMENT selection via a per-user window, not
          // the percentile_disc aggregate: percentile_disc's
          // ObjectHashAggregate updates an interpreted per-group
          // value-frequency map per row — the one non-codegen operator
          // in this plan, and r16's decomposition priced it at ~2.6 s
          // of the query's 6.8 s serial wall (pairs+slopes alone:
          // 0.6 s). The window spelling sorts each user's slopes once
          // (spill-backed, same (user) partitioning the pair join
          // already established — no extra Exchange) and picks the
          // row with row_number = ⌈n/2⌉, which IS percentile_disc(0.5)
          // (smallest value whose cume_dist ≥ 0.5): measured 3.2 →
          // 2.2 s on the decomposed stage, hashes unchanged. The
          // per-user frame stays bounded by per-user activity (k
          // events → k·(k−1)/2 pairs) exactly as before — the
          // distributed CDF is still deliberately NOT used here
          // (SCALE.md round-7 bounded-group policy).
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy("slope_e6")))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy("user_id")))
          // ⌈n/2⌉ in exact integer arithmetic ((n+1) div 2 — `/` is
          // double division, the width-cliff class past 2^53 pairs)
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("user_id"), col("n").cast("long").as("n_pairs"),
            col("slope_e6").as("ts_slope_e6"))
          .orderBy("user_id")
      }),

    // LSH recall report: how many of the EXACT Jaccard ≥ 0.7 pairs
    // (ground truth from the full inverted index) the banded MinHash
    // path actually surfaces — the recall number every LSH deployment
    // must publish. Both pair sets are session materializations
    // already paid for; the report is a join of two tiny tables.
    // DATA-COUPLED oracle: the constant recall_e6 = 1e6 asserts 100%
    // recall, which holds on the pinned corpora (checked at all three
    // SFs and the 10x replica) because the 4x16 banding's per-pair
    // miss probability at J ≥ 0.8-1.0 is ≤ 2e-4 and every true pair
    // here sits well above the threshold. On a REGENERATED corpus with
    // near-threshold pairs a single banding miss fails this row loudly
    // (engine < oracle) — a measurement disagreement to re-pin, not a
    // silent wrongness.
    Q("dedup_lsh_recall",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |exact AS (SELECT ia, ib FROM pairs
             |          JOIN sizes sa ON sa.doc_id = pairs.ia
             |          JOIN sizes sb ON sb.doc_id = pairs.ib
             |          WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7)
             |SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
             |       CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_lsh,
             |       CAST(1000000 AS BIGINT) AS recall_e6""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
        // ground truth: count-based exact pairs from the inverted index
        val exact = graft.text.Dedup
          .ngramJaccardPairs(docs, "doc_id", "text", 0.7)
          .select("id_a", "id_b")
        // LSH path: banded MinHash candidates, exact-verified
        val lsh = graft.text.Dedup
          .nearDupPairs(docs, "doc_id", "text", 0.7)
          .select("id_a", "id_b")
        val nExact = exact.count()
        val nCommon = exact.join(lsh, Seq("id_a", "id_b")).count()
        import s.implicits._
        Seq((nExact, nCommon,
          if (nExact == 0) 1000000L else math.round(nCommon.toDouble / nExact * 1e6)))
          .toDF("n_exact", "n_lsh", "recall_e6")
      }))
}
