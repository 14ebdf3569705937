package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-32 operators: eta-squared effect size and
  * source-to-sink reconciliation.
  */
object Extras34 {

  def queries: Seq[Q] = Seq(
    // eta-squared: the share of order-value variance explained by the
    // priority factor — ANOVA's effect size, computed entirely from
    // exact per-group power sums (DECIMAL(38,0)/HUGEINT): η² = 1 −
    // SS_within/SS_total, each SS a closed form over (n, Σ, Σ²). Two
    // map-side-combined reductions; 5 rows + 1 row cross the wire.
    Q("stat_eta_squared",
      Some("""WITH v AS (SELECT o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |           FROM orders),
             |g AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(c) AS BIGINT) AS s,
             |             sum(CAST(c AS HUGEINT) * c) AS ssq
             |      FROM v GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st,
             |             sum(ssq) * 1000000 AS ssqt6,
             |             sum((CAST(s AS HUGEINT) * s * 1000000) // n) AS sgrp6
             |      FROM g)
             |SELECT nt,
             |       CAST(round((1 - CAST(ssqt6 - sgrp6 AS DOUBLE)
             |            / CAST(ssqt6 - (CAST(st AS HUGEINT) * st * 1000000) // nt AS DOUBLE))
             |            * 1e6) AS BIGINT)
             |         AS eta2_e6
             |FROM t""".stripMargin),
      (s, d) => {
        // every cross-group accumulator is an EXACT integer (ssq in
        // DECIMAL(38,0); the s²/n terms µ-scaled and integrally
        // divided) — the old DOUBLE sums of ssq/sgrp were
        // partition-merge-order dependent past 2^53, a flaky
        // cross-engine ulp at the rounding boundary
        val g = Tables.orders(s, d)
          .select(col("o_orderpriority").as("pri"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
          .groupBy("pri")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("c").cast("long").as("s"),
            expr("sum(CAST(c AS DECIMAL(38,0)) * c)").as("ssq"))
        g.agg(sum("n").cast("long").as("nt"), sum("s").cast("long").as("st"),
            expr("sum(ssq) * 1000000").as("ssqt6"),
            // subtract-remainder-then-decimal-divide (the longDiv
            // spelling, result kept DECIMAL): SQL DIV returns LONG,
            // which the ~1e26 quotient outgrows at the 100 TB design
            // point; the exactly-divisible decimal division is exact
            // with 32 integral digits
            expr("""sum((CAST(s AS DECIMAL(38,0)) * s * 1000000
                   |     - (CAST(s AS DECIMAL(38,0)) * s * 1000000) % n) / n)"""
              .stripMargin).as("sgrp6"))
          .select(col("nt"),
            expr("""CAST(round((1 - CAST(ssqt6 - sgrp6 AS DOUBLE)
                   | / CAST(ssqt6 - (CAST(st AS DECIMAL(38,0)) * st * 1000000
                   |                 - (CAST(st AS DECIMAL(38,0)) * st * 1000000) % nt) / nt
                   |        AS DOUBLE)) * 1e6) AS BIGINT)"""
              .stripMargin).as("eta2_e6"))
      }),

    // source-to-sink reconciliation: after landing orders partitioned
    // by status, re-read the sink and compare per-partition row counts
    // and exact cent checksums against the source — the totals-match
    // audit every regulated pipeline runs after a load. A mismatch row
    // would carry both sides; here every partition must match.
    Q("dq_reconciliation",
      Some("""SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n_src,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents_src,
             |       CAST(count(*) AS BIGINT) AS n_sink,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS cents_sink,
             |       TRUE AS reconciled
             |FROM orders GROUP BY 1 ORDER BY st""".stripMargin),
      (s, d) => {
        val src = Tables.orders(s, d)
        val out = s"${sys.props("java.io.tmpdir")}/graft_dq_recon_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        val srcAgg = src.groupBy(col("o_orderstatus").as("st"))
          .agg(count(lit(1)).cast("long").as("n_src"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents_src"))
        val sinkAgg = s.read.parquet(out)
          .groupBy(col("o_orderstatus").as("st"))
          .agg(count(lit(1)).cast("long").as("n_sink"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("cents_sink"))
        srcAgg.join(sinkAgg, "st")
          .withColumn("reconciled",
            col("n_src") === col("n_sink") &&
              col("cents_src") === col("cents_sink"))
          .orderBy("st")
      }))
}
