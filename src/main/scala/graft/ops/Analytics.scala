package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/behavioral analytics over the event log [EXT]: funnel
  * conversion, cohort retention, rolling anomaly scores. The OLAP
  * shapes a SaaS ETL product reports from its event table — each one
  * shuffle-conscious: everything reduces to keyed aggregations or
  * per-key windows, never a self-join of the raw log.
  */
object Analytics {

  def queries: Seq[Q] = Seq(
    // funnel: first view → first purchase strictly after it, per user.
    // Two filtered aggregations on the user key + one join of the two
    // (already co-partitioned) per-user tables; the raw log is scanned
    // twice but never self-joined at event granularity.
    Q("funnel_conversion",
      Some("""WITH fv AS (SELECT user_id, min(ts) AS first_view
             |            FROM events WHERE event_type = 'view' GROUP BY 1),
             |fp AS (SELECT e.user_id, min(e.ts) AS first_purchase
             |       FROM events e JOIN fv ON e.user_id = fv.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
             |       GROUP BY 1)
             |SELECT fv.user_id, fv.first_view, fp.first_purchase,
             |       fp.first_purchase IS NOT NULL AS converted
             |FROM fv LEFT JOIN fp USING (user_id)
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val fv = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("first_view"))
        val fp = ev.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ts") > col("first_view"))
          .groupBy("user_id").agg(min(col("ts")).as("first_purchase"))
        fv.join(fp, Seq("user_id"), "left")
          .select(col("user_id"), col("first_view"), col("first_purchase"),
            col("first_purchase").isNotNull.as("converted"))
          .orderBy("user_id")
      }),

    // cohort retention: users grouped by first-activity week; for each
    // (cohort, week-offset) the distinct active users. The classic
    // retention triangle — one agg for cohorts, one distinct-activity
    // agg, one join on the user key, final count per cell. date_trunc
    // lands both engines on Monday-start weeks; offsets are exact
    // multiples of 7 days, so the integer division is lossless.
    Q("cohort_retention",
      Some("""WITH f AS (SELECT user_id,
             |                  CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
             |            FROM events GROUP BY 1),
             |a AS (SELECT DISTINCT user_id,
             |             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
             |      FROM events)
             |SELECT f.cohort,
             |       CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
             |       count(DISTINCT a.user_id) AS n_active
             |FROM a JOIN f ON a.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val f = ev.groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cohort"))
        val a = ev.select(col("user_id"),
          date_trunc("week", col("ts")).as("wk")).distinct()
        a.join(f, "user_id")
          .groupBy(col("cohort"),
            (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
          .agg(count_distinct(col("user_id")).as("n_active"))
          .orderBy("cohort", "week_offset")
      }),

    // event-sequence transition matrix: counts of (previous type →
    // type) steps per user timeline — the Markov-chain summary behind
    // next-action models. One window pass on the user key, then a tiny
    // (|types|²) aggregation.
    Q("seq_transitions",
      Some("""SELECT prev_type, event_type, count(*) AS n FROM (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS prev_type,
             |         event_type
             |  FROM events) t
             |WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(lag(col("event_type"), 1).over(w).as("prev_type"),
            col("event_type"))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
          .orderBy("prev_type", "event_type")
      }),

    // time-series resample + forward-fill: each user's value series on
    // a dense hourly grid (sequence/explode generates the grid — no
    // driver loop), missing hours forward-filled from the last
    // observation. Hourly sums are exact decimal; the fill copies
    // doubles verbatim, so both engines hash-match. The grid join is on
    // the (user, hour) key; the fill is one window pass per user.
    Q("ts_resample",
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             |                  date_trunc('hour', max(ts)) AS h1
             |           FROM events GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
             |      FROM b),
             |v AS (SELECT user_id, date_trunc('hour', ts) AS hr,
             |             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS hv
             |      FROM events GROUP BY 1, 2)
             |SELECT g.user_id, g.hr,
             |       last_value(v.hv IGNORE NULLS) OVER (
             |         PARTITION BY g.user_id ORDER BY g.hr
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val_ff
             |FROM g LEFT JOIN v ON v.user_id = g.user_id AND v.hr = g.hr
             |ORDER BY g.user_id, g.hr""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("hr"))
        val hourly = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(sum(col("value").cast("decimal(25,6)")).cast("double").as("hv"))
        val w = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"),
            last(col("hv"), ignoreNulls = true).over(w).as("val_ff"))
          .orderBy("user_id", "hr")
      }),

    // rolling z-score anomaly detection: each event's value scored
    // against the trailing 100 events of its type (full frames only —
    // the warm-up rows where the frame is short have degenerate
    // variance). Mean/variance come from EXACT decimal window sums (the
    // double product value*value rounds identically to 6 decimals in
    // both engines), every subsequent op (division, sqrt, multiply) is
    // IEEE-exact on identical inputs, and the result lands on the 1e-6
    // grid (SCALE.md float policy). One shuffle on event_type, one
    // in-partition sort — the streaming-friendly anomaly shape.
    Q("window_zscore",
      Some("""SELECT event_id,
             |       CAST(round(
             |         (value - s1 / n) /
             |         sqrt(nullif(s2 / n - (s1 / n) * (s1 / n), 0)) * 1e6)
             |         AS BIGINT) AS z_e6
             |FROM (
             |  SELECT event_id, value,
             |         CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s1,
             |         CAST(sum(CAST(value * value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s2,
             |         CAST(count(*) OVER w AS DOUBLE) AS n
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             |               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)) t
             |WHERE n = 100
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        // Frame sums come from RUNNING-sum differences, not a bounded
        // frame: Spark re-aggregates a sliding ROWS frame per row
        // (O(n·frame) — measured 9s at sf0.1), while the running sum is
        // incremental (O(n)) and the difference of two exact decimals
        // IS the frame sum exactly, so the oracle (which uses the
        // bounded frame directly) still hash-matches.
        val ord = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          col("ts"), col("value"),
          sum(col("value").cast("decimal(25,6)")).over(run).as("c1"),
          sum((col("value") * col("value")).cast("decimal(25,6)")).over(run).as("c2"),
          row_number().over(ord).as("rn"))
          .select(col("event_id"), col("value"),
            (col("c1") - coalesce(lag(col("c1"), 100).over(ord),
              lit(0).cast("decimal(25,6)"))).cast("double").as("s1"),
            (col("c2") - coalesce(lag(col("c2"), 100).over(ord),
              lit(0).cast("decimal(25,6)"))).cast("double").as("s2"),
            col("rn"))
          .filter(col("rn") >= 100)
          .withColumn("n", lit(100.0))
          .select(col("event_id"),
            expr("""CAST(round(
                   |  (value - s1 / n) /
                   |  sqrt(nullif(s2 / n - (s1 / n) * (s1 / n), 0)) * 1e6)
                   |  AS BIGINT)""".stripMargin).as("z_e6"))
          .orderBy("event_id")
      })
  )
}
