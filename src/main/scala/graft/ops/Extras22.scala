package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-19 operators: point-in-time SCD-2 lookup, the three
  * Pythagorean means, and frequency encoding.
  */
object Extras22 {

  def queries: Seq[Q] = Seq(
    // point-in-time dimension lookup: each purchase resolves the SCD-2
    // version (built from the user's own event-type history) that was
    // valid AT its timestamp — the "what did the dimension say then"
    // correctness every reproducible backtest needs. Same one-shuffle
    // as-of union as join_asof: version starts and probes share one
    // partition-sort; no interval join, no per-row probe.
    Q("join_pit_scd2",
      Some("""WITH c AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         CASE WHEN lag(event_type) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id)
             |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |v AS (SELECT user_id, event_type, ts,
             |        sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS version
             |      FROM c),
             |g AS (SELECT user_id, version, min(ts) AS valid_from
             |      FROM v GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id,
             |       CAST((SELECT max(g.version) FROM g
             |             WHERE g.user_id = p.user_id
             |               AND g.valid_from <= p.ts) AS BIGINT) AS version_at
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val scd = Scd.buildScd2(ev, col("user_id"), col("event_type"),
          col("ts"), col("event_id"))
        val starts = scd.select(col("key").as("k"),
          col("valid_from").as("t"), lit(null).cast("long").as("event_id"),
          col("version").as("v"), lit(0).as("is_probe"))
        val probes = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("k"), col("ts").as("t"), col("event_id"),
            lit(null).cast("long").as("v"), lit(1).as("is_probe"))
        // `v` tiebreaker: two SCD-2 versions sharing a valid_from
        // (same-user same-ts events) both sort as (t, 0); without it
        // last("v") picks an arbitrary version while the oracle takes
        // the max — probes are null-v so their slot is unaffected
        val w = Window.partitionBy("k")
          .orderBy(col("t"), col("is_probe"), col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        starts.unionByName(probes)
          .withColumn("version_at", last("v", ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            col("version_at").cast("long").as("version_at"))
          .orderBy("event_id")
      }),

    // arithmetic, geometric, and harmonic mean of order cents per
    // priority, all engine-exact: arithmetic = one rounded division of
    // exact sums; geometric = exp of the mean of per-row µ-rounded ln
    // terms (associative BIGINT sum); harmonic = n over the sum of
    // per-row picofied reciprocals (each µ-rounded once). AM ≥ GM ≥ HM
    // is the structural self-check.
    Q("agg_pythagorean_means",
      Some("""WITH v AS (SELECT o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |           FROM orders),
             |g AS (SELECT pri, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(c) AS BIGINT) AS s,
             |        CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT) AS sln6,
             |        CAST(sum(CAST(round(1e12 / c) AS BIGINT)) AS BIGINT) AS srec12
             |      FROM v GROUP BY 1)
             |SELECT pri, n,
             |       CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS am_cents,
             |       CAST(round(exp(CAST(sln6 AS DOUBLE) / n / 1e6)) AS BIGINT) AS gm_cents,
             |       CAST(round(CAST(n AS DOUBLE) * 1e12 / srec12) AS BIGINT) AS hm_cents
             |FROM g ORDER BY pri""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderpriority").as("pri"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        .groupBy("pri")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("c").cast("long").as("s"),
          sum(expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1e6) AS BIGINT)"))
            .cast("long").as("sln6"),
          sum(expr("CAST(round(1e12 / c) AS BIGINT)")).cast("long").as("srec12"))
        .select(col("pri"), col("n"),
          expr("CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT)").as("am_cents"),
          expr("CAST(round(exp(CAST(sln6 AS DOUBLE) / n / 1e6)) AS BIGINT)")
            .as("gm_cents"),
          expr("CAST(round(CAST(n AS DOUBLE) * 1e12 / srec12) AS BIGINT)")
            .as("hm_cents"))
        .orderBy("pri")),

    // frequency (count) encoding: each categorical value replaced by
    // its occurrence count — the lightweight sibling of LOO target
    // encoding (no target needed, no leakage question). Counts reduce
    // once and BROADCAST back; the fact never shuffles.
    Q("feature_count_encode",
      Some("""WITH g AS (SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n
             |           FROM customer GROUP BY 1)
             |SELECT c.c_custkey, c.c_mktsegment AS seg, g.n AS seg_count,
             |       CAST(round(CAST(g.n AS DOUBLE) * 1e6
             |            / (SELECT count(*) FROM customer)) AS BIGINT) AS seg_share_e6
             |FROM customer c JOIN g ON c.c_mktsegment = g.seg
             |ORDER BY c.c_custkey""".stripMargin),
      (s, d) => {
        val cst = Tables.customer(s, d)
        val g = cst.groupBy(col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).cast("long").as("n"))
        val tot = cst.agg(count(lit(1)).cast("long").as("tot"))
        cst.select(col("c_custkey"), col("c_mktsegment").as("seg"))
          .join(broadcast(g), "seg")
          .crossJoin(broadcast(tot))
          .select(col("c_custkey"), col("seg"), col("n").as("seg_count"),
            expr("CAST(round(CAST(n AS DOUBLE) * 1e6 / tot) AS BIGINT)")
              .as("seg_share_e6"))
          .orderBy("c_custkey")
      }))
}
