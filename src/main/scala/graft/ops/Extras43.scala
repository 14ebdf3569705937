package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-41 operators: the empirical survival curve and the
  * Brown–Forsythe (median-centered Levene) variance-homogeneity test.
  */
object Extras43 {

  def queries: Seq[Q] = Seq(
    // customer-lifetime survival curve: S(t) = share of customers
    // whose first-to-last-order span exceeds t days — the retention
    // curve product teams read before any churn model. Lifetimes
    // reduce per customer (one shuffle); the curve itself is a
    // cumulative sum over DISTINCT lifetime days, a cardinality
    // bounded by the date range (~2.4k rows here, never the customer
    // count), so the unpartitioned running-sum window is safe at any
    // scale.
    Q("analytics_survival_curve",
      Some("""WITH life AS (SELECT o_custkey,
             |    CAST(date_diff('day', min(o_orderdate), max(o_orderdate))
             |         AS BIGINT) AS days
             |  FROM orders GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM life),
             |g AS (SELECT days, CAST(count(*) AS BIGINT) AS n_ended
             |      FROM life GROUP BY 1)
             |SELECT days, n_ended,
             |       CAST(t.total - sum(n_ended) OVER (ORDER BY days) AS BIGINT)
             |         AS n_surviving,
             |       CAST(round((t.total - sum(n_ended) OVER (ORDER BY days))
             |            * 1e6 / t.total) AS BIGINT) AS surv_e6
             |FROM g CROSS JOIN t ORDER BY days""".stripMargin),
      (s, d) => {
        val life = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(datediff(max("o_orderdate"), min("o_orderdate"))
            .cast("long").as("days"))
        val t = life.agg(count(lit(1)).cast("long").as("total"))
        val g = life.groupBy("days").agg(count(lit(1)).cast("long").as("n_ended"))
        val w = Window.orderBy("days")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.crossJoin(broadcast(t))
          .select(col("days"), col("n_ended"),
            (col("total") - sum("n_ended").over(w)).cast("long")
              .as("n_surviving"),
            round((col("total") - sum("n_ended").over(w)) * 1e6 / col("total"))
              .cast("long").as("surv_e6"))
          .orderBy("days")
      }),

    // Brown–Forsythe test (Levene centered at the MEDIAN): do the
    // priority groups have equal spread? The ANOVA-F closed form
    // applied to z = |x − group median|, the robust pre-check run
    // before trusting stat_f_oneway's equal-variance assumption.
    // Medians land on half-cents, so 2·|x−med| is an exact BIGINT and
    // the whole statistic reuses the one-pass power-sum shape; the
    // group medians broadcast back (no second fact shuffle).
    Q("stat_levene",
      Some("""WITH v AS (SELECT o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |           FROM orders),
             |med AS (SELECT pri, quantile_cont(c, 0.5) AS m FROM v GROUP BY 1),
             |z AS (SELECT v.pri, CAST(round(abs(v.c - med.m) * 2) AS BIGINT) AS z2
             |      FROM v JOIN med USING (pri)),
             |g AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(z2) AS BIGINT) AS s,
             |             CAST(sum(CAST(z2 AS HUGEINT) * z2) AS DOUBLE) AS ssq
             |      FROM z GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
             |             CAST(count(*) AS BIGINT) AS k,
             |             CAST(sum(s) AS BIGINT) AS st,
             |             CAST(sum(ssq) AS DOUBLE) AS ssqt,
             |             CAST(sum(CAST(s AS DOUBLE) * s / n) AS DOUBLE) AS sgrp
             |      FROM g)
             |SELECT nt, k, k - 1 AS df_between, nt - k AS df_within,
             |       CAST(round(((sgrp - CAST(st AS DOUBLE) * st / nt) / (k - 1))
             |            / ((ssqt - sgrp) / (nt - k)) * 1e6) AS BIGINT) AS w_e6
             |FROM t""".stripMargin),
      (s, d) => {
        val v = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        // per-group median via the distributed per-group CDF — the
        // percentile() GROUP BY spelling buffers every group value
        // (ScaleRank.groupedQuantilesCont doc); halves on integer
        // cents interpolate FP-exactly
        val med = ScaleRank.groupedQuantilesCont(v, "pri", "c",
          Seq(1 -> 2), Seq("m"), x => floor(x / 65536))
        val g = v.join(broadcast(med), "pri")
          .select(col("pri"),
            expr("CAST(round(abs(c - m) * 2) AS BIGINT)").as("z2"))
          .groupBy("pri")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("z2").cast("long").as("s"),
            expr("CAST(sum(CAST(z2 AS DECIMAL(38,0)) * z2) AS DOUBLE)").as("ssq"))
        g.agg(sum("n").cast("long").as("nt"),
            count(lit(1)).cast("long").as("k"),
            sum("s").cast("long").as("st"),
            sum("ssq").as("ssqt"),
            sum(expr("CAST(s AS DOUBLE) * s / n")).as("sgrp"))
          .select(col("nt"), col("k"),
            (col("k") - 1).cast("long").as("df_between"),
            (col("nt") - col("k")).cast("long").as("df_within"),
            expr("""CAST(round(((sgrp - CAST(st AS DOUBLE) * st / nt) / (k - 1))
                   | / ((ssqt - sgrp) / (nt - k)) * 1e6) AS BIGINT)"""
              .stripMargin).as("w_e6"))
      }))
}
