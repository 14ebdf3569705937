package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-37 operators: one-way ANOVA F and the IQR outlier
  * audit.
  */
object Extras39 {

  def queries: Seq[Q] = Seq(
    // one-way ANOVA F: does order value differ across priorities?
    // Computed in closed form from per-group power sums (n, Σ, Σ²) —
    // the same one-pass map-side-combined shape as eta-squared, but
    // reporting the F statistic with its degrees of freedom instead of
    // the effect size. Exact integer cents (DECIMAL(38,0)) until the
    // final ratio; 5 rows + 1 row cross the wire at any scale.
    Q("stat_f_oneway",
      Some("""WITH v AS (SELECT o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |           FROM orders),
             |g AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(c) AS BIGINT) AS s,
             |             sum(CAST(c AS HUGEINT) * c) AS ssq
             |      FROM v GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
             |             CAST(count(*) AS BIGINT) AS k,
             |             CAST(sum(s) AS BIGINT) AS st,
             |             sum(ssq) * 1000000 AS ssqt6,
             |             sum((CAST(s AS HUGEINT) * s * 1000000) // n) AS sgrp6
             |      FROM g)
             |SELECT nt, k, k - 1 AS df_between, nt - k AS df_within,
             |       CAST(round((CAST(sgrp6 - (CAST(st AS HUGEINT) * st * 1000000) // nt AS DOUBLE) / (k - 1))
             |            / (CAST(ssqt6 - sgrp6 AS DOUBLE) / (nt - k)) * 1e6) AS BIGINT) AS f_e6
             |FROM t""".stripMargin),
      (s, d) => {
        val g = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
          .groupBy("pri")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("c").cast("long").as("s"),
            // exact cross-group accumulation (same rework as
            // stat_eta_squared: double sums were merge-order dependent)
            expr("sum(CAST(c AS DECIMAL(38,0)) * c)").as("ssq"))
        g.agg(sum("n").cast("long").as("nt"),
            count(lit(1)).cast("long").as("k"),
            sum("s").cast("long").as("st"),
            expr("sum(ssq) * 1000000").as("ssqt6"),
            // longDiv spelling with a DECIMAL result (SQL DIV returns
            // LONG, too narrow for the ~1e26 quotient at scale)
            expr("""sum((CAST(s AS DECIMAL(38,0)) * s * 1000000
                   |     - (CAST(s AS DECIMAL(38,0)) * s * 1000000) % n) / n)"""
              .stripMargin).as("sgrp6"))
          .select(col("nt"), col("k"),
            (col("k") - 1).cast("long").as("df_between"),
            (col("nt") - col("k")).cast("long").as("df_within"),
            expr("""CAST(round((CAST(sgrp6 - (CAST(st AS DECIMAL(38,0)) * st * 1000000
                   |                  - (CAST(st AS DECIMAL(38,0)) * st * 1000000) % nt) / nt
                   |        AS DOUBLE) / (k - 1))
                   | / (CAST(ssqt6 - sgrp6 AS DOUBLE) / (nt - k)) * 1e6) AS BIGINT)"""
              .stripMargin).as("f_e6"))
      }),

    // IQR outlier audit: per event type, Tukey fences (Q1 − 1.5·IQR,
    // Q3 + 1.5·IQR) on exact cents, then counts and extremes of the
    // points outside them. Fences come from one sort-based percentile
    // pass over ≤ a handful of groups; the recount joins them back by
    // BROADCAST (the fence table is group-cardinality small at any
    // data scale), so the only shuffle is the two groupBys on the same
    // key. Quartiles of integers interpolate on quarter-fractions —
    // exact in binary, so the fence comparisons and the ×4 outputs are
    // deterministic across engines.
    Q("dq_outlier_iqr",
      Some("""WITH e AS (SELECT event_type,
             |             CAST(round(value * 100) AS BIGINT) AS c
             |           FROM events),
             |f AS (SELECT event_type, quantile_cont(c, 0.25) AS q1,
             |             quantile_cont(c, 0.75) AS q3
             |      FROM e GROUP BY 1)
             |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
             |       CAST(round(min(f.q1) * 4) AS BIGINT) AS q1_x4,
             |       CAST(round(min(f.q3) * 4) AS BIGINT) AS q3_x4,
             |       CAST(sum(CASE WHEN c < f.q1 - 1.5 * (f.q3 - f.q1)
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
             |       CAST(sum(CASE WHEN c > f.q3 + 1.5 * (f.q3 - f.q1)
             |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
             |       CAST(coalesce(min(CASE WHEN c < f.q1 - 1.5 * (f.q3 - f.q1)
             |                              THEN c END), -1) AS BIGINT)
             |         AS min_outlier_c,
             |       CAST(coalesce(max(CASE WHEN c > f.q3 + 1.5 * (f.q3 - f.q1)
             |                              THEN c END), -1) AS BIGINT)
             |         AS max_outlier_c
             |FROM e JOIN f USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        // distributed per-group quartiles — exact quarter interpolation
        // on cents (ScaleRank.groupedQuantilesCont doc)
        val f = ScaleRank.groupedQuantilesCont(e, "event_type", "c",
          Seq(1 -> 4, 3 -> 4), Seq("q1", "q3"), x => floor(x / 64))
        val lo = col("q1") - (col("q3") - col("q1")) * 1.5
        val hi = col("q3") + (col("q3") - col("q1")) * 1.5
        e.join(broadcast(f), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n"),
            expr("CAST(round(min(q1) * 4) AS BIGINT)").as("q1_x4"),
            expr("CAST(round(min(q3) * 4) AS BIGINT)").as("q3_x4"),
            sum(when(col("c") < lo, 1L).otherwise(0L)).cast("long").as("n_low"),
            sum(when(col("c") > hi, 1L).otherwise(0L)).cast("long").as("n_high"),
            coalesce(min(when(col("c") < lo, col("c"))), lit(-1L))
              .cast("long").as("min_outlier_c"),
            coalesce(max(when(col("c") > hi, col("c"))), lit(-1L))
              .cast("long").as("max_outlier_c"))
          .orderBy("event_type")
      }))
}
