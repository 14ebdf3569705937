package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-42 operators: rolling MAD anomaly scoring and banded
  * dynamic-time-warping self-similarity.
  */
object Extras44 {

  /** Banded DTW on integer series: cost(i,j) = |a(i)−b(j)| + min of the
    * three predecessors, cells outside |i−j|≤band unreachable. O(n·band)
    * time, two-row memory. */
  private[graft] def dtwBand(a: Array[Long], b: Array[Long], band: Int): Long = {
    val INF = Long.MaxValue / 4
    var prev = Array.fill(b.length + 1)(INF)
    var cur = Array.fill(b.length + 1)(INF)
    prev(0) = 0L
    var i = 1
    while (i <= a.length) {
      java.util.Arrays.fill(cur, INF)
      var j = math.max(1, i - band)
      val jMax = math.min(b.length, i + band)
      while (j <= jMax) {
        val step = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        if (step < INF) cur(j) = math.abs(a(i - 1) - b(j - 1)) + step
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  def queries: Seq[Q] = Seq(
    // rolling MAD: trailing-7 median and median-absolute-deviation per
    // reading, flagging points beyond 3 MADs — the robust anomaly
    // score that, unlike the z-score, one spike can't poison. Same
    // collect-sort-index frame trick as window_rolling_median (exact
    // integer cents, 1-based lower median on both engines), one window
    // pass, bounded 7-element lists.
    Q("window_rolling_mad",
      Some("""WITH l AS (SELECT user_id, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS c,
             |    list(CAST(round(value * 100) AS BIGINT))
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS lst
             |  FROM events),
             |m AS (SELECT user_id, event_id, c, lst,
             |        CAST(list_sort(lst)[CAST((len(lst) + 1) // 2 AS BIGINT)]
             |             AS BIGINT) AS med
             |      FROM l),
             |m2 AS (SELECT user_id, event_id, c, med,
             |         CAST(list_sort(list_transform(lst, x -> abs(x - med)))
             |              [CAST((len(lst) + 1) // 2 AS BIGINT)] AS BIGINT) AS mad
             |       FROM m)
             |SELECT user_id, event_id, med AS med_cents, mad AS mad_cents,
             |       (mad > 0 AND abs(c - med) > 3 * mad) AS is_anomaly
             |FROM m2 ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-6, 0)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .withColumn("lst", collect_list("c").over(w))
          .withColumn("med", expr(
            "CAST(element_at(array_sort(lst), CAST((size(lst) + 1) div 2 AS INT)) AS BIGINT)"))
          .withColumn("mad", expr(
            """CAST(element_at(array_sort(transform(lst, x -> abs(x - med))),
              | CAST((size(lst) + 1) div 2 AS INT)) AS BIGINT)""".stripMargin))
          .select(col("user_id"), col("event_id"),
            col("med").as("med_cents"), col("mad").as("mad_cents"),
            (col("mad") > 0 && abs(col("c") - col("med")) > col("mad") * 3)
              .as("is_anomaly"))
          .orderBy("user_id", "event_id")
      }),

    // banded DTW self-similarity: per user, the dynamic-time-warping
    // distance between the first and second half of their reading
    // series (≤32 points each, Sakoe-Chiba band 8) — "does late
    // behavior still look like early behavior" drift scoring. A
    // sequential DP no SQL window can express → Dataset typed API:
    // groupByKey(user).mapGroups runs the O(n·band) kernel per group,
    // groups spread across executors, nothing but (user, cost) rows
    // come back. The ORACLE replays the DP as a recursive CTE over
    // ANTI-DIAGONALS: cells on diagonal d = i+j depend only on
    // diagonals d−1 and d−2 (never on the diagonal being built), so
    // each step is a pure list_transform over the previous two carried
    // lists — the same trick that vectorizes DTW on SIMD/GPUs. Cost
    // values derived from INF stay ≥ INF/2 and can never beat a real
    // path in least(), so the reachable final cell is bit-identical to
    // the kernel's.
    Q("ts_dtw_band",
      Some("""WITH RECURSIVE
             |ser AS (
             |  SELECT user_id, list(c ORDER BY us, event_id) AS cs
             |  FROM (SELECT user_id, epoch_us(ts) AS us, event_id,
             |               CAST(round(value * 100) AS BIGINT) AS c FROM events) t
             |  GROUP BY user_id),
             |ab AS (
             |  SELECT user_id, cs2[1 : len2 // 2] AS a,
             |         cs2[len2 // 2 + 1 : len2] AS b,
             |         len2 // 2 AS n, len2 - len2 // 2 AS m
             |  FROM (SELECT user_id, cs[1:64] AS cs2,
             |               least(len(cs), 64) AS len2 FROM ser) t),
             |dp(user_id, d, diag1, diag2) AS (
             |  SELECT user_id, 1,
             |         list_transform(range(0, n + 1), x -> 2305843009213693951),
             |         list_transform(range(0, n + 1),
             |           x -> CASE WHEN x = 0 THEN 0 ELSE 2305843009213693951 END)
             |  FROM ab WHERE n > 0 AND m > 0
             |  UNION ALL
             |  SELECT dp.user_id, dp.d + 1,
             |         list_transform(range(0, ab.n + 1), i ->
             |           CASE WHEN i >= 1 AND dp.d + 1 - i >= 1 AND dp.d + 1 - i <= ab.m
             |                     AND abs(2 * i - dp.d - 1) <= 8
             |                THEN abs(ab.a[i] - ab.b[dp.d + 1 - i]) +
             |                     least(dp.diag1[i + 1], dp.diag1[i], dp.diag2[i])
             |                ELSE 2305843009213693951 END),
             |         dp.diag1
             |  FROM dp JOIN ab ON dp.user_id = ab.user_id
             |  WHERE dp.d < ab.n + ab.m),
             |res AS (
             |  SELECT dp.user_id, dp.diag1[ab.n + 1] AS cost
             |  FROM dp JOIN ab ON dp.user_id = ab.user_id
             |  WHERE dp.d = ab.n + ab.m)
             |SELECT ab.user_id, CAST(ab.n AS BIGINT) AS n_a,
             |       CAST(ab.m AS BIGINT) AS n_b,
             |       CAST(coalesce(res.cost, -1) AS BIGINT) AS dtw_cost_cents
             |FROM ab LEFT JOIN res ON ab.user_id = res.user_id
             |ORDER BY ab.user_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .as[(Long, Long, Long, Long)]
          .groupByKey(_._1)
          .mapGroups { (u, it) =>
            // bounded 64-element selection WHILE streaming the group
            // iterator: it.toArray would buffer a power user's entire
            // stream on one task (the unbounded-per-group-buffer class
            // the r9 audit pinned out everywhere else) when only the
            // 64 earliest (us, event_id) rows are ever used — a size-64
            // max-heap keeps memory O(64) at any activity level
            val ord = Ordering.by[(Long, Long, Long), (Long, Long)](e =>
              (e._1, e._2))
            val pq = scala.collection.mutable.PriorityQueue.empty(ord)
            it.foreach { r =>
              val e = (r._2, r._3, r._4)
              if (pq.size < 64) pq.enqueue(e)
              else if (ord.lt(e, pq.head)) { pq.dequeue(); pq.enqueue(e) }
            }
            val cs = pq.toArray.sortBy(e => (e._1, e._2)).map(_._3)
            val (a, b) = cs.splitAt(cs.length / 2)
            (u, a.length.toLong, b.length.toLong,
              if (a.isEmpty || b.isEmpty) -1L else dtwBand(a, b, 8))
          }
          .toDF("user_id", "n_a", "n_b", "dtw_cost_cents")
          .orderBy("user_id")
      }))
}
