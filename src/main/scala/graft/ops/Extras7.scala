package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-4 operators: peak-preserving downsampling, exact-count
  * Shannon entropy, correlated LATERAL joins, the AQE REBALANCE hint,
  * and injection-safe IDENTIFIER binding. All oracled (SCALE.md float
  * policy: exact integers cross the hash gate, never raw doubles).
  */
object Extras7 {

  def queries: Seq[Q] = Seq(
    // peak-preserving downsample: per (user, hour) keep the point that
    // deviates most from the bucket mean — the one-point-per-bucket
    // reduction that keeps spikes a plain avg-resample would erase
    // (LTTB's relational cousin). The deviation compare is exact
    // integer: |v·n − Σv| in µ-units avoids the mean division. One
    // shuffle on (user, hour); the bucket stats and the rank share it.
    Q("ts_downsample_peaks",
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             |                  ts, event_id, CAST(round(value * 1e6) AS BIGINT) AS v6
             |           FROM events),
             |s AS (SELECT *, count(*) OVER b AS n, sum(v6) OVER b AS s6
             |      FROM e WINDOW b AS (PARTITION BY user_id, hr)),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, hr
             |        ORDER BY abs(v6 * n - s6) DESC, ts, event_id) AS rk FROM s)
             |SELECT user_id, hr, event_id, v6, CAST(n AS BIGINT) AS n_in_bucket
             |FROM r WHERE rk = 1 ORDER BY user_id, hr""".stripMargin),
      (s, d) => {
        val b = Window.partitionBy("user_id", "hr")
        val e = Tables.events(s, d).select(col("user_id"),
          date_trunc("hour", col("ts")).as("hr"), col("ts"), col("event_id"),
          round(col("value") * lit(1e6)).cast("long").as("v6"))
        e.withColumn("n", count(lit(1)).over(b))
          .withColumn("s6", sum(col("v6")).over(b))
          .withColumn("rk", row_number().over(b.orderBy(
            abs(col("v6") * col("n") - col("s6")).desc, col("ts"), col("event_id"))))
          .filter(col("rk") === 1)
          .select(col("user_id"), col("hr"), col("event_id"), col("v6"),
            col("n").as("n_in_bucket"))
          .orderBy("user_id", "hr")
      }),

    // Shannon entropy of each feed's hour-of-day profile, exactly:
    // H = ln(n) − Σ c·ln(c) / n. Every ln(c) is µ-rounded per TERM
    // (integer c → identical double → identical round in any engine),
    // so the Σ c·ln6(c) accumulator is exact integer arithmetic —
    // associative, partition-order-free — and accumulates in
    // DECIMAL(38,0)/HUGEINT (a 64-bit sum crosses 2⁶³ near ~4e11 rows
    // per type; the exported BIGINT column then overflows LOUDLY and
    // identically in both engines instead of mid-aggregation
    // divergence). Only the final closed form (identical
    // text both sides) touches floats. Two tiny aggregations.
    Q("agg_entropy",
      Some("""WITH h AS (SELECT event_type, hour(ts) AS hh, count(*) AS c
             |           FROM events GROUP BY 1, 2),
             |a AS (SELECT event_type, sum(c) AS n, count(*) AS n_buckets,
             |             sum(CAST(c AS HUGEINT) * CAST(round(ln(c) * 1e6) AS BIGINT)) AS cln6
             |      FROM h GROUP BY 1)
             |SELECT event_type, CAST(n AS BIGINT) AS n_events,
             |       CAST(n_buckets AS BIGINT) AS n_buckets,
             |       CAST(cln6 AS BIGINT) AS sum_c_ln6,
             |       CAST(round((ln(n) - cln6 / (n * 1e6)) * 1e6) AS BIGINT) AS entropy6
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events_ent")
        s.sql("""WITH h AS (SELECT event_type, hour(ts) AS hh, count(*) AS c
                |           FROM events_ent GROUP BY 1, 2),
                |a AS (SELECT event_type, sum(c) AS n, count(*) AS n_buckets,
                |             sum(CAST(c AS DECIMAL(38,0)) * CAST(round(ln(c) * 1e6) AS BIGINT)) AS cln6
                |      FROM h GROUP BY 1)
                |SELECT event_type, CAST(n AS BIGINT) AS n_events,
                |       CAST(n_buckets AS BIGINT) AS n_buckets,
                |       CAST(cln6 AS BIGINT) AS sum_c_ln6,
                |       CAST(round((ln(n) - cln6 / (n * 1e6)) * 1e6) AS BIGINT) AS entropy6
                |FROM a ORDER BY event_type""".stripMargin)
      }),

    // correlated LATERAL join — top-2 customers per nation where the
    // subquery references the outer row (the per-row-subquery surface;
    // Spark decorrelates it into a ranked window, not N probes — the
    // plan that survives a billion outer rows).
    Q("sql_lateral_correlated",
      Some("""SELECT n.n_name, t.c_name, t.bal_cents
             |FROM nation n JOIN LATERAL (
             |  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON true
             |ORDER BY n.n_name, t.bal_cents DESC, t.c_name""".stripMargin),
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation_lat")
        Tables.customer(s, d).createOrReplaceTempView("customer_lat")
        s.sql("""SELECT n.n_name, t.c_name, t.bal_cents
                |FROM nation_lat n JOIN LATERAL (
                |  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
                |  FROM customer_lat c WHERE c.c_nationkey = n.n_nationkey
                |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
                |ORDER BY n.n_name, t.bal_cents DESC, t.c_name""".stripMargin)
      }),

    // AQE REBALANCE hint — the post-aggregation layout fix: splits
    // oversized partitions AND coalesces tiny ones at runtime (unlike
    // repartition(n), which fixes n blind). The query result is
    // hint-invariant; the plan shape is pinned in PlanShapeSpec.
    Q("sql_rebalance_hint",
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_rb")
        s.sql("""SELECT /*+ REBALANCE(o_orderpriority) */ o_orderpriority,
                |       count(*) AS n,
                |       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                |FROM orders_rb GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)
      }),

    // IDENTIFIER(:param) — injection-safe dynamic table/column names
    // (Spark 4): the identifier binds as a catalog reference, never as
    // SQL text, completing sql_parameterized (which binds VALUES).
    Q("sql_identifier_clause",
      Some("""SELECT n_nationkey, n_name FROM nation
             |ORDER BY n_nationkey""".stripMargin),
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation_idf")
        s.sql(
          "SELECT n_nationkey, n_name FROM IDENTIFIER(:tbl) ORDER BY IDENTIFIER(:ord)",
          Map("tbl" -> "nation_idf", "ord" -> "n_nationkey"))
      })
  )
}
