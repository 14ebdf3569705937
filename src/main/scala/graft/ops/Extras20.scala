package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-17 operators: population-stability drift (PSI) and
  * time-to-convert latency percentiles.
  */
object Extras20 {

  def queries: Seq[Q] = Seq(
    // population stability index between the first and second half of
    // the timeline: values bucket into deciles by BROADCAST threshold
    // cutpoints (exact deciles off the distributed CDF — 9 tiny
    // scalars; NO global-sort ntile and no whole-column percentile
    // buffer, so the bucketing is a map-side CASE at any scale),
    // halves split at the exact µs
    // midpoint by cross-multiplied integers, and each bucket
    // contributes (p−q)·ln(p/q) with +1 Laplace smoothing (structural
    // zero-proofing) µ-rounded before the associative sum. The ML-ops
    // drift gate between a reference and a live window.
    Q("dq_psi",
      Some("""WITH c0 AS (SELECT event_id, ts,
             |              CAST(round(value * 100) AS BIGINT) AS cents
             |            FROM events),
             |q AS (SELECT CAST(quantile_disc(cents, 0.1) AS BIGINT) AS q1,
             |             CAST(quantile_disc(cents, 0.2) AS BIGINT) AS q2,
             |             CAST(quantile_disc(cents, 0.3) AS BIGINT) AS q3,
             |             CAST(quantile_disc(cents, 0.4) AS BIGINT) AS q4,
             |             CAST(quantile_disc(cents, 0.5) AS BIGINT) AS q5,
             |             CAST(quantile_disc(cents, 0.6) AS BIGINT) AS q6,
             |             CAST(quantile_disc(cents, 0.7) AS BIGINT) AS q7,
             |             CAST(quantile_disc(cents, 0.8) AS BIGINT) AS q8,
             |             CAST(quantile_disc(cents, 0.9) AS BIGINT) AS q9
             |      FROM c0),
             |m AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
             |h AS (SELECT CAST(CASE WHEN cents <= q.q1 THEN 1 WHEN cents <= q.q2 THEN 2
             |                  WHEN cents <= q.q3 THEN 3 WHEN cents <= q.q4 THEN 4
             |                  WHEN cents <= q.q5 THEN 5 WHEN cents <= q.q6 THEN 6
             |                  WHEN cents <= q.q7 THEN 7 WHEN cents <= q.q8 THEN 8
             |                  WHEN cents <= q.q9 THEN 9 ELSE 10 END AS BIGINT) AS bk,
             |        CASE WHEN epoch_us(c0.ts) * 2 <= m.mn + m.mx THEN 1 ELSE 2 END AS half
             |      FROM c0 CROSS JOIN q CROSS JOIN m),
             |c AS (SELECT bk,
             |        CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS c1,
             |        CAST(count(*) FILTER (WHERE half = 2) AS BIGINT) AS c2
             |      FROM h GROUP BY 1),
             |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM c)
             |SELECT c.bk, c.c1, c.c2,
             |       CAST(round((CAST(c.c1 + 1 AS DOUBLE) / (n.n1 + 10)
             |              - CAST(c.c2 + 1 AS DOUBLE) / (n.n2 + 10))
             |            * ln((CAST(c.c1 + 1 AS DOUBLE) / (n.n1 + 10))
             |               / (CAST(c.c2 + 1 AS DOUBLE) / (n.n2 + 10))) * 1e6) AS BIGINT)
             |         AS psi_term_e6
             |FROM c CROSS JOIN n ORDER BY bk""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val c0 = ev.select(col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        // nine exact decile cutpoints via the distributed CDF + the
        // shared CASE ladder — the percentile_disc spelling buffers
        // the whole column per cutpoint (ScaleRank.exactQuantilesDisc
        // doc)
        val m = ev.agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
        val c = ScaleRank.binByQuantiles(c0, "cents", 10, "bk")
          .crossJoin(broadcast(m))
          .withColumn("half",
            when(unix_micros(col("ts")) * 2 <= col("mn") + col("mx"), 1)
              .otherwise(2))
          .groupBy("bk")
          .agg(count(when(col("half") === 1, 1)).cast("long").as("c1"),
            count(when(col("half") === 2, 1)).cast("long").as("c2"))
        val n = c.agg(sum("c1").cast("long").as("n1"),
          sum("c2").cast("long").as("n2"))
        c.crossJoin(broadcast(n))
          .select(col("bk"), col("c1"), col("c2"),
            expr("""CAST(round((CAST(c1 + 1 AS DOUBLE) / (n1 + 10)
                   |   - CAST(c2 + 1 AS DOUBLE) / (n2 + 10))
                   | * ln((CAST(c1 + 1 AS DOUBLE) / (n1 + 10))
                   |    / (CAST(c2 + 1 AS DOUBLE) / (n2 + 10))) * 1e6) AS BIGINT)"""
              .stripMargin).as("psi_term_e6"))
          .orderBy("bk")
      }),

    // time-to-convert: per purchase, the µs delay since the user's
    // most recent prior view (the as-of union trick — one shuffle, no
    // per-row probe), then the latency summary every funnel report
    // leads with: count, discrete median/p90, max — all exact integer
    // µs, percentile_disc picks elements so no interpolation
    // arithmetic crosses engines.
    Q("analytics_time_to_convert",
      Some("""WITH a AS (
             |  SELECT p.event_id, epoch_us(p.ts) -
             |         (SELECT max(epoch_us(v.ts)) FROM events v
             |          WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |            AND v.ts <= p.ts) AS delay_us
             |  FROM events p WHERE p.event_type = 'purchase')
             |SELECT CAST(count(delay_us) AS BIGINT) AS n_converted,
             |       CAST(quantile_disc(delay_us, 0.5) AS BIGINT) AS med_us,
             |       CAST(quantile_disc(delay_us, 0.9) AS BIGINT) AS p90_us,
             |       CAST(max(delay_us) AS BIGINT) AS max_us
             |FROM a WHERE delay_us IS NOT NULL""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val p = ev.filter(col("event_type") === "purchase").select(
          col("user_id").as("k"), col("ts").as("t"), col("event_id"),
          lit(null).cast("timestamp").as("v_ts"), lit(1).as("is_probe"))
        val v = ev.filter(col("event_type") === "view").select(
          col("user_id").as("k"), col("ts").as("t"),
          lit(null).cast("long").as("event_id"),
          col("ts").as("v_ts"), lit(0).as("is_probe"))
        val w = Window.partitionBy("k").orderBy(col("t"), col("is_probe"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val delays = p.unionByName(v)
          .withColumn("last_view_ts", last("v_ts", ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1 && col("last_view_ts").isNotNull)
          .select((unix_micros(col("t")) - unix_micros(col("last_view_ts")))
            .as("delay_us"))
        // everything — count, discrete med/p90 (element-picking, so any
        // fraction is exact), max — off ONE pass over the delay
        // pipeline: the constant-group CDF core reduces to
        // (delay, count), cumulates under (group, bucket) windows, and
        // a single aggregate row reads all four figures (__n is the
        // non-null count, max(__v) the max). The percentile_disc
        // spelling buffered every delay in one aggregation buffer; an
        // eager-quantile spelling would re-execute the union+window
        // delays pipeline per driver pass. (Zero converted rows would
        // yield no row here where the ungrouped oracle yields a null
        // row — the documented empty-group edge; the funnel data
        // always converts.)
        val aggs = Seq(
          max(col("__n")).cast("long").as("n_converted"),
          min(when(col("__run") * 2 >= col("__n"), col("__v")))
            .cast("long").as("med_us"),
          min(when(col("__run") * 10 >= col("__n") * 9, col("__v")))
            .cast("long").as("p90_us"),
          max(col("__v")).cast("long").as("max_us"))
        ScaleRank.groupedCdfAgg(delays.withColumn("__grp", lit(1)),
            "__grp", "delay_us", x => floor(x / 67108864L), aggs)
          .select("n_converted", "med_us", "p90_us", "max_us")
      }))
}
