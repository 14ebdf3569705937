package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-7 operators: RFM customer segmentation, association
  * rules (support/confidence/lift), chi-square independence, KL
  * divergence, rolling median, CUSUM control charts, weekly churn, and
  * per-customer log returns. Float policy per SCALE.md: exact
  * cents/µ-int accumulators; doubles only inside one identical
  * closed-form expression text per query (ln/division of exact
  * integers is IEEE-identical across engines).
  */
object Extras10 {

  def queries: Seq[Q] = Seq(
    // RFM segmentation: recency (days since last order), frequency
    // (order count) and monetary (cents spend) per customer, each
    // scored into quintiles under a TOTAL order (metric, custkey) so
    // ties cannot shift buckets; score 5 = best. Scale: one
    // partial+final aggregation on custkey reduces orders to one row
    // per customer, then each quintile assignment is the EXACT
    // ntile(5) computed by ScaleRank.withGlobalRank — range-bucketed
    // two-phase ranking with broadcast offsets, no single-partition
    // sort even at 10⁹ customers.
    Q("analytics_rfm",
      Some("""WITH base AS (
             |  SELECT o_custkey AS ck,
             |         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
             |              (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS BIGINT) AS r_days,
             |         count(*) AS f,
             |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m_cents
             |  FROM orders GROUP BY 1),
             |s AS (SELECT ck, r_days, f, m_cents,
             |        6 - ntile(5) OVER (ORDER BY r_days, ck) AS r_score,
             |        ntile(5) OVER (ORDER BY f, ck) AS f_score,
             |        ntile(5) OVER (ORDER BY m_cents, ck) AS m_score
             |      FROM base)
             |SELECT ck, r_days, f, m_cents,
             |       CAST(r_score AS BIGINT) AS r_score,
             |       CAST(f_score AS BIGINT) AS f_score,
             |       CAST(m_score AS BIGINT) AS m_score,
             |       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             |         || CAST(m_score AS VARCHAR) AS rfm
             |FROM s ORDER BY ck""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
        val maxDate = o.agg(max(to_date(col("o_orderdate"))).as("gmax"))
        val base = o.groupBy(col("o_custkey").as("ck"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("f"),
            sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
              .cast("long").as("m_cents"))
          .crossJoin(broadcast(maxDate))
          .select(col("ck"),
            datediff(col("gmax"), col("last_d")).cast("long").as("r_days"),
            col("f"), col("m_cents"))
          // r16 (guide §1.2/§5): ScaleRank's eager passes (cutpoint
          // sketch, joint-cell counts) plus the three ranking windows
          // each re-ran this whole reduction — 5 scans of orders (and
          // 5 of the broadcast max-date aggregate) for a ≤|customers|-
          // row frame. One lazy localCheckpoint makes the reduction
          // the single fact pass every consumer reads.
          .localCheckpoint(false)
        // one fused ScaleRank pass for all three quintiles: one
        // cutpoint sketch + one count aggregation over the scan,
        // instead of three independent round-trips (r5 VERDICT #2)
        val ranked = ScaleRank.withGlobalRanksMulti(base, Seq(
            ScaleRank.RankOn("r_days", "__rk_r", nName = Some("__n")),
            ScaleRank.RankOn("f", "__rk_f"),
            ScaleRank.RankOn("m_cents", "__rk_m")), "ck")
        val scored = ranked
          .withColumn("r_score", lit(6L) -
            ScaleRank.ntileFromRank(col("__rk_r"), col("__n"), 5))
          .withColumn("f_score",
            ScaleRank.ntileFromRank(col("__rk_f"), col("__n"), 5))
          .withColumn("m_score",
            ScaleRank.ntileFromRank(col("__rk_m"), col("__n"), 5))
          .drop("__rk_r", "__rk_f", "__rk_m", "__n")
        scored.select(col("ck"), col("r_days"), col("f"), col("m_cents"),
            col("r_score"), col("f_score"), col("m_score"),
            concat(col("r_score").cast("string"), col("f_score").cast("string"),
              col("m_score").cast("string")).as("rfm"))
          .orderBy("ck")
      }),

    // association rules over per-user event-type baskets: for every
    // unordered type pair, users-with-both (support), conditional
    // share (confidence) and independence ratio (lift). The basket
    // table is the DISTINCT (user, type) set — bounded by |users| ×
    // |type vocabulary|, so the self-join explodes per-user pairs of
    // a ≤5-element set, never raw events. Counts are exact BIGINTs;
    // ratios are µ-ints of exact-integer operands. Marginals (5 rows)
    // and the user total (1 row) broadcast to the pair table.
    Q("analytics_basket_lift",
      Some("""WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
             |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM b),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM b GROUP BY 1),
             |p AS (SELECT a.event_type AS t1, c.event_type AS t2,
             |             CAST(count(*) AS BIGINT) AS n_ab
             |      FROM b a JOIN b c ON a.user_id = c.user_id
             |                        AND a.event_type < c.event_type
             |      GROUP BY 1, 2)
             |SELECT p.t1, p.t2, p.n_ab,
             |       CAST(round(CAST(p.n_ab AS DOUBLE) * 1e6 / n.n_users) AS BIGINT) AS support_e6,
             |       CAST(round(CAST(p.n_ab AS DOUBLE) * 1e6 / m1.n_t) AS BIGINT) AS conf_e6,
             |       CAST(round(CAST(p.n_ab AS DOUBLE) * n.n_users * 1e6
             |            / (CAST(m1.n_t AS DOUBLE) * m2.n_t)) AS BIGINT) AS lift_e6
             |FROM p JOIN m m1 ON p.t1 = m1.event_type
             |       JOIN m m2 ON p.t2 = m2.event_type
             |       CROSS JOIN n
             |ORDER BY t1, t2""".stripMargin),
      (s, d) => {
        val b = Tables.events(s, d).select("user_id", "event_type").distinct()
        val n = b.agg(countDistinct("user_id").cast("long").as("n_users"))
        val m = b.groupBy("event_type").agg(count(lit(1)).cast("long").as("n_t"))
        val a1 = b.select(col("user_id").as("u1"), col("event_type").as("t1"))
        val a2 = b.select(col("user_id").as("u2"), col("event_type").as("t2"))
        val p = a1.join(a2, col("u1") === col("u2") && col("t1") < col("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).cast("long").as("n_ab"))
        p.join(broadcast(m.withColumnRenamed("event_type", "t1")
              .withColumnRenamed("n_t", "n_t1")), "t1")
          .join(broadcast(m.withColumnRenamed("event_type", "t2")
              .withColumnRenamed("n_t", "n_t2")), "t2")
          .crossJoin(broadcast(n))
          .select(col("t1"), col("t2"), col("n_ab"),
            expr("CAST(round(CAST(n_ab AS DOUBLE) * 1e6 / n_users) AS BIGINT)")
              .as("support_e6"),
            expr("CAST(round(CAST(n_ab AS DOUBLE) * 1e6 / n_t1) AS BIGINT)")
              .as("conf_e6"),
            expr("""CAST(round(CAST(n_ab AS DOUBLE) * n_users * 1e6
                   | / (CAST(n_t1 AS DOUBLE) * n_t2)) AS BIGINT)""".stripMargin)
              .as("lift_e6"))
          .orderBy("t1", "t2")
      }),

    // chi-square independence test: market segment × order status
    // contingency table. Per-cell term (O·n − rt·ct)²/(n·rt·ct) keeps
    // every operand an exact integer — the squared numerator rides a
    // DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so a 1000× scale-up
    // cannot overflow — and only the final division runs in DOUBLE
    // (identical exact-int inputs → identical IEEE result). One fact
    // aggregation to 15 cells; marginals derive from the cells and
    // broadcast back.
    Q("stat_chi_square",
      Some("""WITH obs AS (
             |  SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st,
             |         CAST(count(*) AS BIGINT) AS o_cnt
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |rt AS (SELECT seg, CAST(sum(o_cnt) AS BIGINT) AS r_tot FROM obs GROUP BY seg),
             |ct AS (SELECT st, CAST(sum(o_cnt) AS BIGINT) AS c_tot FROM obs GROUP BY st),
             |n AS (SELECT CAST(sum(o_cnt) AS BIGINT) AS tot FROM obs)
             |SELECT obs.seg, obs.st, obs.o_cnt,
             |       CAST(round(CAST(rt.r_tot AS DOUBLE) * ct.c_tot * 1e6 / n.tot) AS BIGINT) AS expected_e6,
             |       CAST(round(CAST(CAST(obs.o_cnt * n.tot - rt.r_tot * ct.c_tot AS HUGEINT)
             |                       * (obs.o_cnt * n.tot - rt.r_tot * ct.c_tot) AS DOUBLE) * 1e6
             |            / (CAST(n.tot AS DOUBLE) * rt.r_tot * ct.c_tot)) AS BIGINT) AS term_e6
             |FROM obs JOIN rt USING (seg) JOIN ct USING (st) CROSS JOIN n
             |ORDER BY seg, st""".stripMargin),
      (s, d) => {
        val obs = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_orderstatus").as("st"))
          .agg(count(lit(1)).cast("long").as("o_cnt"))
        val rt = obs.groupBy("seg").agg(sum("o_cnt").cast("long").as("r_tot"))
        val ct = obs.groupBy("st").agg(sum("o_cnt").cast("long").as("c_tot"))
        val n = obs.agg(sum("o_cnt").cast("long").as("tot"))
        obs.join(broadcast(rt), "seg").join(broadcast(ct), "st")
          .crossJoin(broadcast(n))
          .select(col("seg"), col("st"), col("o_cnt"),
            expr("CAST(round(CAST(r_tot AS DOUBLE) * c_tot * 1e6 / tot) AS BIGINT)")
              .as("expected_e6"),
            expr("""CAST(round(CAST(CAST(o_cnt * tot - r_tot * c_tot AS DECIMAL(38,0))
                   |   * (o_cnt * tot - r_tot * c_tot) AS DOUBLE) * 1e6
                   |   / (CAST(tot AS DOUBLE) * r_tot * c_tot)) AS BIGINT)""".stripMargin)
              .as("term_e6"))
          .orderBy("seg", "st")
      }),

    // KL divergence of the weekend event-type mix from the overall mix:
    // per-term p·ln(p/q) in µ-nats, each term computed from four exact
    // BIGINT counts inside ONE closed-form expression and µ-rounded
    // BEFORE any summation (associative BIGINT adds — float
    // accumulation order can never matter). Two partial+final
    // aggregations over the fact, 5-row join.
    Q("stat_kl_divergence",
      Some("""WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_all FROM events GROUP BY 1),
             |w AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_we
             |      FROM events WHERE isodow(ts) >= 6 GROUP BY 1),
             |t AS (SELECT CAST(sum(n_all) AS BIGINT) AS tot,
             |             (SELECT CAST(sum(n_we) AS BIGINT) FROM w) AS tot_we FROM a)
             |SELECT a.event_type, w.n_we, a.n_all,
             |       CAST(round(CAST(w.n_we AS DOUBLE) * 1e6 / t.tot_we) AS BIGINT) AS p_e6,
             |       CAST(round(CAST(a.n_all AS DOUBLE) * 1e6 / t.tot) AS BIGINT) AS q_e6,
             |       CAST(round(CAST(w.n_we AS DOUBLE) / t.tot_we
             |            * ln(CAST(w.n_we AS DOUBLE) * t.tot
             |                 / (CAST(t.tot_we AS DOUBLE) * a.n_all)) * 1e6) AS BIGINT) AS kl_term_e6
             |FROM a JOIN w USING (event_type) CROSS JOIN t
             |ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val a = ev.groupBy("event_type").agg(count(lit(1)).cast("long").as("n_all"))
        val w = ev.filter(expr("weekday(ts) + 1 >= 6"))
          .groupBy("event_type").agg(count(lit(1)).cast("long").as("n_we"))
        val t = a.agg(sum("n_all").cast("long").as("tot"))
          .crossJoin(broadcast(w.agg(sum("n_we").cast("long").as("tot_we"))))
        a.join(w, "event_type").crossJoin(broadcast(t))
          .select(col("event_type"), col("n_we"), col("n_all"),
            expr("CAST(round(CAST(n_we AS DOUBLE) * 1e6 / tot_we) AS BIGINT)").as("p_e6"),
            expr("CAST(round(CAST(n_all AS DOUBLE) * 1e6 / tot) AS BIGINT)").as("q_e6"),
            expr("""CAST(round(CAST(n_we AS DOUBLE) / tot_we
                   | * ln(CAST(n_we AS DOUBLE) * tot
                   |      / (CAST(tot_we AS DOUBLE) * n_all)) * 1e6) AS BIGINT)""".stripMargin)
              .as("kl_term_e6"))
          .orderBy("event_type")
      }),

    // trailing-7-row lower median of event cents per user: the frame's
    // sorted list indexed at (n+1)/2 — an EXPLICIT construction both
    // engines execute identically (no quantile-semantics drift), on
    // exact cent integers. One shuffle on user_id; the materialized
    // frame list is ≤ 7 wide regardless of history, so per-row state
    // is O(frame) — same cost class as window_ewma.
    Q("window_rolling_median",
      Some("""SELECT user_id, event_id,
             |       CAST(list_sort(lst)[CAST((len(lst) + 1) // 2 AS BIGINT)] AS BIGINT)
             |         AS med_cents
             |FROM (SELECT user_id, event_id,
             |        list(CAST(round(value * 100) AS BIGINT))
             |          OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS lst
             |      FROM events) t
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-6, 0)
        Tables.events(s, d)
          .withColumn("lst",
            collect_list(expr("CAST(round(value * 100) AS BIGINT)")).over(w))
          .select(col("user_id"), col("event_id"),
            expr("CAST(element_at(sort_array(lst), CAST((size(lst) + 1) DIV 2 AS INT)) AS BIGINT)")
              .as("med_cents"))
          .orderBy("user_id", "event_id")
      }),

    // CUSUM control chart: running sum of deviations from the user's
    // own mean (µ-ints; the mean is rounded ONCE to an integer with
    // one identical double division, then every accumulation is exact
    // BIGINT). Drift flag when |cusum| exceeds 5× the mean. One
    // aggregation for per-user means (broadcast back) + one window
    // shuffle on user_id.
    Q("ts_cusum",
      Some("""WITH m AS (SELECT user_id,
             |             CAST(round(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
             |                  / count(*)) AS BIGINT) AS mean6
             |           FROM events GROUP BY 1),
             |c AS (SELECT e.user_id, e.ts, e.event_id,
             |        CAST(sum(CAST(round(e.value * 1e6) AS BIGINT) - m.mean6)
             |          OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum6,
             |        m.mean6
             |      FROM events e JOIN m USING (user_id))
             |SELECT user_id, event_id, cusum6,
             |       CAST(abs(cusum6) > 5 * mean6 AS BOOLEAN) AS drifted
             |FROM c ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val m = ev.groupBy("user_id").agg(
          expr("""CAST(round(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
                 | / count(*)) AS BIGINT)""".stripMargin).as("mean6"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // per-user means SCALE with users — unhinted: the shuffled
        // join on user_id co-partitions with the window right below,
        // so at scale it is one reused exchange, not a broadcast
        ev.join(m, "user_id")
          .withColumn("cusum6",
            sum(expr("CAST(round(value * 1e6) AS BIGINT)") - col("mean6"))
              .over(w).cast("long"))
          .select(col("user_id"), col("event_id"), col("cusum6"),
            (abs(col("cusum6")) > col("mean6") * 5).as("drifted"))
          .orderBy("user_id", "event_id")
      }),

    // weekly churn: users active in week w split into retained (also
    // active in w+7d) vs churned. The distinct (user, week) activity
    // set (≪ events) is the only shuffled table; the next-week probe
    // is a self left join on the co-partitioned key. Exact counts.
    Q("analytics_churn",
      Some("""WITH a AS (SELECT DISTINCT user_id,
             |             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
             |           FROM events)
             |SELECT a.wk, CAST(count(*) AS BIGINT) AS active,
             |       CAST(count(b.user_id) AS BIGINT) AS retained,
             |       CAST(count(*) - count(b.user_id) AS BIGINT) AS churned
             |FROM a LEFT JOIN a b
             |  ON a.user_id = b.user_id AND b.wk = a.wk + INTERVAL 7 DAY
             |GROUP BY a.wk ORDER BY a.wk""".stripMargin),
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val nxt = act.select(col("user_id"),
          (col("wk") - expr("INTERVAL 7 DAY")).as("wk"), lit(1).as("hit"))
        act.join(nxt, Seq("user_id", "wk"), "left")
          .groupBy("wk")
          .agg(count(lit(1)).cast("long").as("active"),
            count(col("hit")).cast("long").as("retained"),
            (count(lit(1)) - count(col("hit"))).cast("long").as("churned"))
          .orderBy("wk")
      }),

    // per-customer log returns between consecutive orders:
    // ln(pₜ/pₜ₋₁) in µ-units from exact cent integers (one identical
    // ln(int/int) per row — no accumulation), plus the total exact
    // cents delta. One window shuffle on the customer key.
    Q("ts_log_returns",
      Some("""WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS p,
             |             lag(CAST(round(o_totalprice * 100) AS BIGINT))
             |               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
             |           FROM orders)
             |SELECT ck, ok, p, prev,
             |       CAST(round(ln(CAST(p AS DOUBLE) / prev) * 1e6) AS BIGINT) AS logret_e6,
             |       CAST(p - prev AS BIGINT) AS delta_cents
             |FROM o WHERE prev IS NOT NULL
             |ORDER BY ck, ok""".stripMargin),
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("p"),
            col("o_orderdate"))
          .withColumn("prev", lag("p", 1).over(
            Window.partitionBy("ck").orderBy("o_orderdate", "ok")))
          .filter(col("prev").isNotNull)
          .select(col("ck"), col("ok"), col("p"), col("prev"),
            expr("CAST(round(ln(CAST(p AS DOUBLE) / prev) * 1e6) AS BIGINT)")
              .as("logret_e6"),
            (col("p") - col("prev")).cast("long").as("delta_cents"))
          .orderBy("ck", "ok")
      }))
}
