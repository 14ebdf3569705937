package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-5 operators: exponentially-weighted moving averages and
  * percentile winsorization. Float policy per SCALE.md: EWMA folds use
  * only exact-IEEE halving steps in a deterministic left fold, so the
  * double itself is engine-exact; winsorize clamps at percentile_disc
  * thresholds (values FROM the set — no interpolation arithmetic).
  */
object Extras8 {

  def queries: Seq[Q] = Seq(
    // trailing EWMA (α = 0.5) over each user's last 8 event values.
    // The fold acc → 0.5·acc + 0.5·x multiplies by exact powers of two
    // and both engines run the IDENTICAL left-to-right fold over the
    // frame-ordered list (Spark `aggregate` HOF seeded with the first
    // element ≡ DuckDB `list_reduce`), so the resulting double is
    // bit-identical — no tolerance needed, µ-scaled for the hash gate.
    // Scale shape: one shuffle on user_id; the frame list is ≤ 8 wide
    // regardless of history length, so state per row is O(frame), and
    // a streaming variant maps to the same recurrence in
    // mapGroupsWithState (see stream_zscore).
    Q("window_ewma",
      Some("""SELECT user_id, event_id,
             |       CAST(round(list_reduce(lst, (a, b) -> 0.5*a + 0.5*b) * 1e6) AS BIGINT) AS ewma_e6
             |FROM (SELECT user_id, event_id,
             |        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
             |      FROM events) t
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-7, 0)
        Tables.events(s, d)
          .withColumn("lst", collect_list(col("value")).over(w))
          .select(col("user_id"), col("event_id"),
            expr("""CAST(round(aggregate(slice(lst, 2, size(lst) - 1),
                   |     CAST(element_at(lst, 1) AS DOUBLE),
                   |     (a, x) -> 0.5D * a + 0.5D * x) * 1e6) AS BIGINT)""".stripMargin)
              .as("ewma_e6"))
          .orderBy("user_id", "event_id")
      }),

    // winsorization: clamp event values into [p05, p95] of their
    // event_type. percentile_disc picks members of the value set (no
    // interpolation → engine-exact doubles); the thresholds are 5 rows,
    // broadcast to the fact scan, so the clamp is map-side — one
    // aggregation shuffle for the thresholds, zero for the apply.
    Q("feature_winsorize",
      Some("""WITH th AS (SELECT event_type,
             |              quantile_disc(value, 0.05) AS lo,
             |              quantile_disc(value, 0.95) AS hi
             |            FROM events GROUP BY event_type)
             |SELECT e.event_id, e.event_type,
             |       CAST(round(least(greatest(e.value, th.lo), th.hi) * 1e6) AS BIGINT) AS v_wins_e6,
             |       CAST(e.value < th.lo OR e.value > th.hi AS BOOLEAN) AS clipped
             |FROM events e JOIN th USING (event_type)
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        // per-group thresholds via the distributed per-group CDF — the
        // percentile_disc GROUP BY spelling buffers every value of the
        // group (ScaleRank.groupedQuantilesDisc doc). The bucket fn is
        // floor(v*1024), NOT floor(v): values are continuous doubles in
        // ~[0,500], so whole-unit cells cap the within-group window
        // parallelism at ~500 tasks whose distinct-value width grows
        // linearly with the data (~n/500 rows sorted per task at 1e12
        // events — the width-cliff class); 1/1024-unit cells keep each
        // window sort bounded by local value density. Cutpoints are
        // bucket-fn-independent (the CDF is exact).
        val th = ScaleRank.groupedQuantilesDisc(
          ev.select(col("event_type"), col("value")), "event_type", "value",
          Seq(1 -> 20, 19 -> 20), Seq("lo", "hi"), v => floor(v * 1024))
        ev.join(broadcast(th), "event_type")
          .select(col("event_id"), col("event_type"),
            round(least(greatest(col("value"), col("lo")), col("hi")) * lit(1e6))
              .cast("long").as("v_wins_e6"),
            (col("value") < col("lo") || col("value") > col("hi")).as("clipped"))
          .orderBy("event_id")
      }))
}
