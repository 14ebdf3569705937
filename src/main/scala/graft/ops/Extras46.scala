package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-44 operators: the weekly activity heatmap and the 2-D
  * histogram grid.
  */
object Extras46 {

  def queries: Seq[Q] = Seq(
    // weekly activity heatmap: events bucketed by (day-of-week, hour)
    // with counts and exact cent totals — the load-profile / "when are
    // users here" grid behind every ops dashboard. One reduction to a
    // ≤168-cell grid, fully map-side-combinable; dow aligned to
    // Spark's 1=Sunday convention on both engines.
    Q("ts_activity_heatmap",
      Some("""SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             |       CAST(hour(ts) AS BIGINT) AS hr,
             |       CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_cents
             |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin),
      (s, d) =>
        Tables.events(s, d)
          .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("long")
              .as("sum_cents"))
          .orderBy("dow", "hr")),

    // 2-D histogram: the (quantity-bucket × discount-bucket) count
    // grid — how a 600M-point scatter plot actually gets rendered.
    // Buckets are closed-form integer floors (no percentile pass
    // needed), so the whole thing is ONE map-side-combined reduction
    // to a bounded grid with revenue overlaid per cell.
    Q("agg_histogram2d",
      Some("""SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
             |       CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |            AS BIGINT) AS revenue_cents
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY qty_bucket, disc_pct""".stripMargin),
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(floor(col("l_quantity") / 10).cast("long").as("qty_bucket"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
              .cast("long").as("revenue_cents"))
          .orderBy("qty_bucket", "disc_pct")))
}
