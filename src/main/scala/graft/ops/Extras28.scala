package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-26 operators: trimmed means and batch sliding windows.
  */
object Extras28 {

  def queries: Seq[Q] = Seq(
    // 10%-trimmed mean of order cents per priority: rank within the
    // group (total order — value then key), drop ceil(n/10) rows from
    // EACH end, one rounded division over the exact surviving sum.
    // The robust center that ignores both whales and give-aways; the
    // rank window and the reduction share one group-key shuffle.
    Q("agg_trimmed_mean",
      Some("""WITH r AS (SELECT o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             |             row_number() OVER (PARTITION BY o_orderpriority
             |                 ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
             |                          o_orderkey) AS rn,
             |             count(*) OVER (PARTITION BY o_orderpriority) AS n
             |           FROM orders)
             |SELECT pri, CAST(max(n) AS BIGINT) AS n,
             |       CAST(count(*) AS BIGINT) AS n_kept,
             |       CAST(round(CAST(sum(c) AS DOUBLE) / count(*)) AS BIGINT)
             |         AS trimmed_mean_cents
             |FROM r
             |WHERE rn > ceil(n * 0.1) AND rn <= n - ceil(n * 0.1)
             |GROUP BY pri ORDER BY pri""".stripMargin),
      (s, d) => {
        val src = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        // trimmed sums straight off the distributed per-group CDF — no
        // per-group row_number window (one whole-group sort task per
        // priority at scale). A value's rows occupy the rank band
        // (__run−__cnt, __run]; the kept band is (lo, n−lo] with
        // lo = ceil(n*0.1) (same double expression as the oracle);
        // boundary ties contribute their overlap width — every row of
        // a tied value shares c, so the within-tie key order the
        // oracle's row_number imposes cannot change the kept SUM or
        // COUNT, only which equal-valued rows are "kept".
        val lo = ceil(col("__n") * 0.1).cast("long")
        val kept = greatest(lit(0L),
          least(col("__run"), col("__n") - lo) -
            greatest(lo, col("__run") - col("__cnt")))
        val aggs = Seq(
          max(col("__n")).cast("long").as("n"),
          sum(kept).cast("long").as("n_kept"),
          round(sum(col("__v") * kept).cast("double") / sum(kept))
            .cast("long").as("trimmed_mean_cents"))
        ScaleRank.groupedCdfAgg(src, "pri", "c",
            x => floor(x / 65536), aggs)
          // a group too small to keep any rows (n ≤ 2 ⇒ empty kept
          // band) is ABSENT from the oracle (its rows all fail the rn
          // filter before GROUP BY) — drop it here too rather than
          // emit a (pri, n, 0, null) row
          .filter(col("n_kept") > 0)
          .orderBy("pri")
      }),

    // BATCH sliding windows: window(ts, '2 hours', '1 hour') assigns
    // every event to BOTH overlapping 2-hour windows — the same
    // operator streaming uses, here in batch form (the oracle derives
    // the two slots per event explicitly). Counts are exact; the
    // expand-then-aggregate shape is what a 100 TB rollup pays: rows ×
    // (window/slide) before the partial aggregation.
    Q("ts_sliding_batch",
      Some("""WITH slots AS (
             |  SELECT event_type, ts,
             |         unnest([date_trunc('hour', ts),
             |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
             |  FROM events)
             |SELECT CAST(ws AS TIMESTAMP) AS ws, event_type,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM slots GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type")))
}
