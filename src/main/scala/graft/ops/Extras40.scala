package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-38 operators: rolling correlation and robust (median/
  * IQR) feature scaling.
  */
object Extras40 {

  def queries: Seq[Q] = Seq(
    // rolling Pearson correlation between a reading and its JSON
    // payload metric over the trailing 10 rows of each user's stream —
    // the "are these two signals coupling right now" monitor. Built
    // from exact BIGINT power sums (Σx, Σy, Σx², Σy², Σxy) over ONE
    // row-frame window — six aggregates share the same sort+frame, so
    // Spark evaluates them in a single window pass — then one
    // closed-form double expression at the end, identical on both
    // engines. Emitted only where the frame is full (10 rows) and both
    // variances are nonzero.
    Q("window_rolling_corr",
      Some("""WITH e AS (SELECT user_id, event_id, ts,
             |             CAST(round(value * 100) AS BIGINT) AS x,
             |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
             |           FROM events),
             |w AS (SELECT user_id, event_id,
             |             count(*) OVER win AS n,
             |             sum(x) OVER win AS sx, sum(y) OVER win AS sy,
             |             sum(x * x) OVER win AS sxx, sum(y * y) OVER win AS syy,
             |             sum(x * y) OVER win AS sxy
             |      FROM e
             |      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id,
             |       CAST(round((n * sxy - sx * sy)
             |            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |                   * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             |            * 1e6) AS BIGINT) AS corr_e6
             |FROM w
             |WHERE n = 10 AND n * sxx <> sx * sx AND n * syy <> sy * sy
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-9, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("x"),
            from_json(col("props"),
              org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
              .getField("k").as("y"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(win).as("n"),
            sum("x").over(win).as("sx"), sum("y").over(win).as("sy"),
            sum(col("x") * col("x")).over(win).as("sxx"),
            sum(col("y") * col("y")).over(win).as("syy"),
            sum(col("x") * col("y")).over(win).as("sxy"))
          .filter(col("n") === 10 &&
            col("n") * col("sxx") =!= col("sx") * col("sx") &&
            col("n") * col("syy") =!= col("sy") * col("sy"))
          .select(col("user_id"), col("event_id"),
            expr("""CAST(round((n * sxy - sx * sy)
                   | / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   |        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   | * 1e6) AS BIGINT)""".stripMargin).as("corr_e6"))
          .orderBy("user_id", "event_id")
      }),

    // robust scaling: (x − median) / IQR per priority group — the
    // outlier-insensitive cousin of z-scoring, the normalization step
    // feature pipelines use when the raw column is heavy-tailed. The
    // group statistics are one sort-based percentile pass over ≤ a
    // handful of groups, broadcast back onto the big side (no second
    // shuffle of the fact table). Quartiles of integer cents sit on
    // exact quarter-fractions, so the scaled ×1e6 output is
    // deterministic across engines.
    Q("feature_robust_scale",
      Some("""WITH o AS (SELECT o_orderkey, o_orderpriority AS pri,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |           FROM orders),
             |f AS (SELECT pri, quantile_cont(c, 0.5) AS med,
             |             quantile_cont(c, 0.75) - quantile_cont(c, 0.25) AS iqr
             |      FROM o GROUP BY 1)
             |SELECT o.o_orderkey,
             |       CAST(round((o.c - f.med) / nullif(f.iqr, 0) * 1e6) AS BIGINT)
             |         AS scaled_e6
             |FROM o JOIN f USING (pri)
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        // distributed per-group quartiles (ScaleRank.groupedQuantilesCont
        // doc) — quarters on integer cents interpolate FP-exactly, so
        // iqr = q3 − q1 equals the old single-expression subtraction
        val f = ScaleRank.groupedQuantilesCont(o.select("pri", "c"),
            "pri", "c", Seq(1 -> 4, 1 -> 2, 3 -> 4),
            Seq("q1", "med", "q3"), x => floor(x / 65536))
          .select(col("pri"), col("med"), (col("q3") - col("q1")).as("iqr"))
        o.join(broadcast(f), "pri")
          .select(col("o_orderkey"),
            expr("CAST(round((c - med) / nullif(iqr, 0) * 1e6) AS BIGINT)")
              .as("scaled_e6"))
          .orderBy("o_orderkey")
      }))
}
