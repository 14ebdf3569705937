package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-6 operators: Benford data-quality screening, Gini
  * concentration, max drawdown, tolerance-bounded as-of joins, weighted
  * percentiles, and a seasonal-naive forecast backtest. Float policy
  * per SCALE.md: cents/µ-int accumulators everywhere; doubles appear
  * only inside one identical closed-form expression text per query.
  */
object Extras9 {

  def queries: Seq[Q] = Seq(
    // Benford first-digit screen over order totals: observed share per
    // leading digit vs log10(1+1/d), deviation in µ-units. The classic
    // fabricated-data detector. One partial+final aggregation on a
    // 9-value key off a cents cast — map-side combine collapses
    // everything before the shuffle.
    Q("dq_benford",
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
             |                       AS VARCHAR), 1, 1) AS BIGINT) AS digit
             |           FROM orders),
             |o AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM o)
             |SELECT digit, n,
             |       CAST(round(n * 1e6 / total) AS BIGINT) AS share_e6,
             |       CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1e6) AS BIGINT) AS benford_e6,
             |       CAST(round(n * 1e6 / total) AS BIGINT)
             |         - CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1e6) AS BIGINT) AS dev_e6
             |FROM o, t ORDER BY digit""".stripMargin),
      (s, d) => {
        val digits = Tables.orders(s, d).select(
          expr("CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
            .as("digit"))
        val o = digits.groupBy("digit").agg(count(lit(1)).as("n"))
        val t = o.agg(sum("n").cast("long").as("total"))
        o.crossJoin(broadcast(t))
          .select(col("digit"), col("n"),
            expr("CAST(round(n * 1e6 / total) AS BIGINT)").as("share_e6"),
            expr("CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1e6) AS BIGINT)").as("benford_e6"),
            expr("""CAST(round(n * 1e6 / total) AS BIGINT)
                   | - CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1e6) AS BIGINT)"""
              .stripMargin).as("dev_e6"))
          .orderBy("digit")
      }),

    // Gini coefficient of customer spend per market segment — the
    // sorted-rank formula G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over cents
    // integers, rank-products summed in DECIMAL(38,0) so a 1000×
    // scale-up cannot overflow the accumulator. One shuffle to build
    // per-customer spend, one window rank per segment, one final
    // 5-row aggregation.
    Q("agg_gini",
      Some("""WITH spend AS (
             |  SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
             |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |r AS (SELECT seg, x,
             |        row_number() OVER (PARTITION BY seg ORDER BY x, ck) AS i,
             |        count(*) OVER (PARTITION BY seg) AS n
             |      FROM spend),
             |a AS (SELECT seg, max(n) AS n,
             |        CAST(sum(CAST(i AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2,
             |        CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1
             |      FROM r GROUP BY seg)
             |SELECT seg, CAST(n AS BIGINT) AS n,
             |       CAST(round((2.0 * CAST(s2 AS DOUBLE) / (n * CAST(s1 AS DOUBLE))
             |            - (n + 1.0) / n) * 1e6) AS BIGINT) AS gini_e6
             |FROM a ORDER BY seg""".stripMargin),
      (s, d) => {
        val spend = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("ck"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).cast("long").as("x"))
        val w = Window.partitionBy("seg")
        val r = spend
          .withColumn("i", row_number().over(w.orderBy("x", "ck")))
          .withColumn("n", count(lit(1)).over(w))
        r.groupBy("seg").agg(
            max("n").as("n"),
            sum(expr("CAST(i AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("s2"),
            sum(col("x").cast("decimal(38,0)")).cast("decimal(38,0)").as("s1"))
          .select(col("seg"), col("n").cast("long").as("n"),
            expr("""CAST(round((2.0 * CAST(s2 AS DOUBLE) / (n * CAST(s1 AS DOUBLE))
                   |     - (n + 1.0) / n) * 1e6) AS BIGINT)""".stripMargin).as("gini_e6"))
          .orderBy("seg")
      }),

    // max drawdown per user: equity = running Σvalue (µ-ints), drawdown
    // = running-max(equity) − equity, report each user's worst. Both
    // running aggregates share ONE incremental unbounded-preceding
    // frame sort; the per-user max folds map-side. The financial
    // peak-to-trough primitive, integer-exact.
    Q("window_drawdown",
      Some("""WITH e AS (SELECT user_id, ts, event_id,
             |             CAST(round(value * 1e6) AS BIGINT) AS v6
             |           FROM events),
             |c AS (SELECT user_id, ts, event_id,
             |        sum(v6) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS eq
             |      FROM e),
             |p AS (SELECT user_id, eq,
             |        max(eq) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
             |      FROM c)
             |SELECT user_id, CAST(max(peak - eq) AS BIGINT) AS max_drawdown_e6
             |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(round(value * 1e6) AS BIGINT)").as("v6"))
          .withColumn("eq", sum("v6").over(w))
          .withColumn("peak", max("eq").over(w))
          .groupBy("user_id")
          .agg(max(col("peak") - col("eq")).cast("long").as("max_drawdown_e6"))
          .orderBy("user_id")
      }),

    // tolerance-bounded as-of join: latest view at-or-before each
    // purchase, but only within 1 hour — older matches null out (the
    // pandas merge_asof(tolerance=...) contract). Same union + one
    // shuffle + running last as join_asof; the tolerance is one
    // map-side filter on the matched timestamp, so the scale shape is
    // unchanged.
    Q("join_asof_tolerance",
      Some("""SELECT p.event_id, p.user_id, p.ts,
             |       (SELECT max(v.ts) FROM events v
             |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |          AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR) AS last_view_ts
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => Joins.asOfViews(Tables.events(s, d), Seq("lv" -> false))
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          when(expr("lv >= t - INTERVAL 1 HOUR"), col("lv")).as("last_view_ts"))
        .orderBy("event_id")),

    // weighted median quantity per return flag, weighted by price cents:
    // the smallest q with 2·cumweight ≥ totalweight — the threshold
    // compare is two exact integers (no halving, no interpolation), and
    // cumulative weights are keyed by DISTINCT q so tie order inside a
    // q-run cannot shift the answer. Pre-aggregating to (flag, q) first
    // shrinks the window input to |distinct q| rows per flag.
    Q("agg_weighted_percentile",
      Some("""WITH g AS (SELECT l_returnflag AS flag,
             |             CAST(round(l_quantity * 100) AS BIGINT) AS q100,
             |             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
             |           FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT flag, q100,
             |        CAST(sum(w) OVER (PARTITION BY flag ORDER BY q100) AS BIGINT) AS cw,
             |        CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
             |      FROM g)
             |SELECT flag, CAST(min(q100) AS BIGINT) AS wmedian_q100
             |FROM c WHERE 2 * cw >= tw GROUP BY flag ORDER BY flag""".stripMargin),
      (s, d) => {
        val g = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag").as("flag"),
            expr("CAST(round(l_quantity * 100) AS BIGINT)").as("q100"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long").as("w"))
        val c = g
          .withColumn("cw", sum("w").over(
            Window.partitionBy("flag").orderBy("q100")).cast("long"))
          .withColumn("tw", sum("w").over(Window.partitionBy("flag")).cast("long"))
        c.filter(col("cw") * 2 >= col("tw"))
          .groupBy("flag").agg(min("q100").cast("long").as("wmedian_q100"))
          .orderBy("flag")
      }),

    // seasonal-naive forecast backtest: predict each hour's per-type
    // event-value sum with the value 24 hourly buckets earlier (row
    // lag over the observed-hour series), report per-type MAE in
    // µ-units and the evaluated-bucket count. The cheapest sanity
    // baseline every real forecaster must beat; errors are |Δ| of two
    // exact integer sums.
    Q("ts_forecast_error",
      Some("""WITH h AS (SELECT event_type,
             |             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             |             CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS s6
             |           FROM events GROUP BY 1, 2),
             |p AS (SELECT event_type, s6,
             |        lag(s6, 24) OVER (PARTITION BY event_type ORDER BY hr) AS pred
             |      FROM h)
             |SELECT event_type, count(*) AS n_eval,
             |       CAST(round(CAST(sum(abs(s6 - pred)) AS DOUBLE) / count(*)) AS BIGINT) AS mae_e6
             |FROM p WHERE pred IS NOT NULL
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(sum(expr("CAST(round(value * 1e6) AS BIGINT)")).cast("long").as("s6"))
        val p = h.withColumn("pred",
          lag("s6", 24).over(Window.partitionBy("event_type").orderBy("hr")))
        p.filter(col("pred").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            expr("CAST(round(CAST(sum(abs(s6 - pred)) AS DOUBLE) / count(*)) AS BIGINT)")
              .as("mae_e6"))
          .orderBy("event_type")
      }))
}
