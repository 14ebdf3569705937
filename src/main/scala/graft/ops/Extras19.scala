package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-16 operators: incremental SCD-2 application and cohort
  * LTV curves.
  */
object Extras19 {

  def queries: Seq[Q] = Seq(
    // INCREMENTAL SCD-2: history built from events up to a cutoff, then
    // the post-cutoff delta applied WITHOUT rescanning closed versions
    // — only each key's open version rejoins the gaps-and-islands run,
    // as a pseudo-event carrying its accumulated count, concatenated
    // with the delta. The oracle is the FULL recompute over all
    // events: the incremental path must be indistinguishable from it
    // (split-invariance — the property that makes nightly increments
    // trustworthy). Closed versions never reshuffle; the delta pass
    // shuffles only (open versions + delta rows).
    Q("scd2_apply",
      Some("""WITH c AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         CASE WHEN lag(event_type) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id)
             |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |v AS (
             |  SELECT user_id, event_type, ts,
             |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS version
             |  FROM c),
             |g AS (
             |  SELECT user_id, version, min(event_type) AS event_type,
             |         min(ts) AS valid_from, count(*) AS n_events
             |  FROM v GROUP BY user_id, version)
             |SELECT user_id, CAST(version AS BIGINT) AS version, event_type, valid_from,
             |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             |         AS valid_to,
             |       n_events
             |FROM g ORDER BY user_id, version""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
        val cut = lit(maxTs) - expr("INTERVAL 7 DAYS")
        val base = Scd.buildScd2(ev.filter(col("ts") <= cut),
          col("user_id"), col("event_type"), col("ts"), col("event_id"))
        val closed = base.filter(col("valid_to").isNotNull)
        val open = base.filter(col("valid_to").isNull)
        val pseudo = open.select(col("key"), col("attr"),
          col("valid_from").as("ts"), lit(-1L).as("tie"),
          col("n_events").cast("long").as("w"))
        val deltaRows = ev.filter(col("ts") > cut)
          .select(col("user_id").as("key"), col("event_type").as("attr"),
            col("ts"), col("event_id").as("tie"), lit(1L).as("w"))
        val byTime = Window.partitionBy("key").orderBy("ts", "tie")
        val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val isl = pseudo.unionByName(deltaRows)
          // null-safe <=>, same as Scd.buildScd2: the delta pass must
          // detect changes EXACTLY like the full recompute (IS
          // DISTINCT FROM) or a NULL attribute breaks the query's
          // incremental == full contract
          .withColumn("chg",
            when(!(lag(col("attr"), 1).over(byTime) <=> col("attr")), 1L)
              .otherwise(0L))
          .withColumn("island", sum("chg").over(run))
        val rec = isl.groupBy("key", "island")
          .agg(min("attr").as("attr"), min("ts").as("valid_from"),
            sum("w").cast("long").as("n_events"))
          .join(open.select(col("key"), col("version").as("v0")), Seq("key"), "left")
          .withColumn("version",
            (coalesce(col("v0"), lit(1L)) - 1 + col("island")).cast("long"))
        val byVersion = Window.partitionBy("key").orderBy("version")
        val rec2 = rec
          .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
          .select("key", "version", "attr", "valid_from", "valid_to", "n_events")
        closed.select("key", "version", "attr", "valid_from", "valid_to", "n_events")
          .unionByName(rec2)
          .withColumnRenamed("key", "user_id")
          .withColumnRenamed("attr", "event_type")
          .orderBy("user_id", "version")
      }),

    // cohort LTV curves: cumulative revenue per first-order-month
    // cohort at each month offset, divided by cohort size — the curve
    // growth teams actually plot. Month offsets are exact integer
    // month-index differences (year·12+month — no fractional
    // months_between), revenue rides exact cents, and the running sum
    // partitions by cohort. The (cohort, offset) grid is tiny; cohort
    // sizes broadcast back.
    Q("analytics_ltv",
      Some("""WITH f AS (SELECT o_custkey AS ck,
             |             CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS cohort
             |           FROM orders GROUP BY 1),
             |r AS (SELECT f.cohort,
             |        CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
             |           - (year(f.cohort) * 12 + month(f.cohort)) AS BIGINT) AS offs,
             |        CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
             |      FROM orders o JOIN f ON o.o_custkey = f.ck
             |      GROUP BY 1, 2),
             |n AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users FROM f GROUP BY 1),
             |c AS (SELECT r.cohort, r.offs, r.cents,
             |        CAST(sum(r.cents) OVER (PARTITION BY r.cohort ORDER BY r.offs
             |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
             |      FROM r)
             |SELECT c.cohort, c.offs, c.cents, c.cum_cents, n.n_users,
             |       CAST(round(CAST(c.cum_cents AS DOUBLE) / n.n_users) AS BIGINT)
             |         AS ltv_cents
             |FROM c JOIN n USING (cohort)
             |ORDER BY cohort, offs""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
        val f = o.groupBy(col("o_custkey").as("ck"))
          .agg(date_trunc("month", min(col("o_orderdate"))).as("cohort"))
        val r = o.join(f, col("o_custkey") === col("ck"))
          .groupBy(col("cohort"),
            ((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              - (year(col("cohort")) * 12 + month(col("cohort"))))
              .cast("long").as("offs"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long").as("cents"))
        val n = f.groupBy("cohort").agg(count(lit(1)).cast("long").as("n_users"))
        val w = Window.partitionBy("cohort").orderBy("offs")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        r.withColumn("cum_cents", sum("cents").over(w).cast("long"))
          .join(broadcast(n), "cohort")
          .select(col("cohort"), col("offs"), col("cents"), col("cum_cents"),
            col("n_users"),
            expr("CAST(round(CAST(cum_cents AS DOUBLE) / n_users) AS BIGINT)")
              .as("ltv_cents"))
          .orderBy("cohort", "offs")
      }))
}
