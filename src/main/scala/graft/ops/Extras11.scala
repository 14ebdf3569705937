package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-8 operators: inferential statistics (Welch t, Pearson
  * correlation, two-proportion A/B z-test, lag-1 autocorrelation),
  * seasonal profiling, leave-one-out target encoding, late-arriving
  * dimension handling, and near-dup graph degree centrality.
  *
  * Float policy per SCALE.md: aggregates accumulate EXACT integers
  * (cents / µ-units; DECIMAL(38,0) ⇄ HUGEINT for power sums that could
  * overflow BIGINT at 1000× scale); doubles appear only inside one
  * closed-form expression written with identical text for Spark and
  * DuckDB, so both engines evaluate the same IEEE operation tree over
  * identical exact-integer operands — then µ-round once.
  */
object Extras11 {

  def queries: Seq[Q] = Seq(
    // Welch's two-sample t between BUILDING and MACHINERY account
    // balances. One partial+final aggregation reduces the fact table to
    // TWO rows (n, Σcents, Σcents² per segment — the sufficient
    // statistics); mean/variance/t derive in one closed form. The
    // cents² sum rides DECIMAL(38,0)/HUGEINT so 1000× more customers
    // cannot overflow. At cluster scale the reduction is map-side
    // combined; the final arithmetic touches 2 rows.
    Q("stat_ttest_welch",
      Some("""WITH v AS (SELECT c_mktsegment AS seg,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
             |           FROM customer
             |           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(v) AS BIGINT) AS s,
             |             CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS ssq
             |      FROM v GROUP BY 1)
             |SELECT a.n AS n1, b.n AS n2,
             |       CAST(round((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             |            * 1e2) AS BIGINT) AS mdiff_e2,
             |       CAST(round((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             |            / sqrt(((a.ssq - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1)) / a.n
             |                 + ((b.ssq - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1)) / b.n)
             |            * 1e6) AS BIGINT) AS t_e6
             |FROM (SELECT * FROM g WHERE seg = 'BUILDING') a
             |CROSS JOIN (SELECT * FROM g WHERE seg = 'MACHINERY') b""".stripMargin),
      (s, d) => {
        val g = Tables.customer(s, d)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("seg"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("v"))
          .groupBy("seg")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("v").cast("long").as("s"),
            expr("CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DOUBLE)").as("ssq"))
        val a = g.filter(col("seg") === "BUILDING")
          .select(col("n").as("n1"), col("s").as("s1"), col("ssq").as("q1"))
        val b = g.filter(col("seg") === "MACHINERY")
          .select(col("n").as("n2"), col("s").as("s2"), col("ssq").as("q2"))
        a.crossJoin(broadcast(b)).select(col("n1"), col("n2"),
          expr("""CAST(round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 | * 1e2) AS BIGINT)""".stripMargin).as("mdiff_e2"),
          expr("""CAST(round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 | / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)) / n1
                 |      + ((q2 - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)) / n2)
                 | * 1e6) AS BIGINT)""".stripMargin).as("t_e6"))
      }),

    // Pearson correlation between quantity and price cents per return
    // flag, from the five exact power sums (n, Σx, Σy, Σxy, Σx², Σy²).
    // Σy² (cents²) rides DECIMAL(38,0)/HUGEINT; Σxy stays BIGINT
    // (quantity ≤ 50 bounds it at ~3·10¹⁷ even at 1000×). One
    // map-side-combined aggregation to 3 rows; r in one closed form.
    Q("stat_pearson",
      Some("""WITH v AS (SELECT l_returnflag AS rf,
             |             CAST(l_quantity AS BIGINT) AS x,
             |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
             |           FROM lineitem),
             |g AS (SELECT rf, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(x * y) AS BIGINT) AS sxy,
             |             CAST(sum(x * x) AS BIGINT) AS sxx,
             |             CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
             |      FROM v GROUP BY 1)
             |SELECT rf, n,
             |       CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             |            * 1e6) AS BIGINT) AS r_e6
             |FROM g ORDER BY rf""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag").as("rf"),
          expr("CAST(l_quantity AS BIGINT)").as("x"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
        .groupBy("rf")
        .agg(count(lit(1)).cast("long").as("n"),
          sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
          sum(expr("x * y")).cast("long").as("sxy"),
          sum(expr("x * x")).cast("long").as("sxx"),
          expr("CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)").as("syy"))
        .select(col("rf"), col("n"),
          expr("""CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 | / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 | * 1e6) AS BIGINT)""".stripMargin).as("r_e6"))
        .orderBy("rf")),

    // two-proportion z-test (A/B test readout): URGENT vs LOW priority
    // orders, "conversion" = fulfilled status. The fact reduces to four
    // exact counts in one aggregation; pooled-variance z in one closed
    // form. The single-row output is the whole shuffle payload.
    Q("analytics_abtest",
      Some("""WITH g AS (SELECT
             |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n1,
             |    CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT'
             |                            AND o_orderstatus = 'F') AS BIGINT) AS x1,
             |    CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS n2,
             |    CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW'
             |                            AND o_orderstatus = 'F') AS BIGINT) AS x2
             |  FROM orders)
             |SELECT n1, x1, n2, x2,
             |       CAST(round(CAST(x1 AS DOUBLE) * 1e6 / n1) AS BIGINT) AS p1_e6,
             |       CAST(round(CAST(x2 AS DOUBLE) * 1e6 / n2) AS BIGINT) AS p2_e6,
             |       CAST(round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
             |            / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
             |                 * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
             |                 * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)) * 1e6) AS BIGINT) AS z_e6
             |FROM g""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).cast("long").as("n1"),
          count(when(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderstatus") === "F", 1)).cast("long").as("x1"),
          count(when(col("o_orderpriority") === "5-LOW", 1)).cast("long").as("n2"),
          count(when(col("o_orderpriority") === "5-LOW" &&
            col("o_orderstatus") === "F", 1)).cast("long").as("x2"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          expr("CAST(round(CAST(x1 AS DOUBLE) * 1e6 / n1) AS BIGINT)").as("p1_e6"),
          expr("CAST(round(CAST(x2 AS DOUBLE) * 1e6 / n2) AS BIGINT)").as("p2_e6"),
          expr("""CAST(round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)
                 | / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                 |      * (1 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                 |      * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)) * 1e6) AS BIGINT)""".stripMargin)
            .as("z_e6"))),

    // hour-of-day seasonal index: each hour's mean event cents vs the
    // global mean, as µ-ratios of exact integers. 24-row result; the
    // global totals derive from the hourly cells (no second fact
    // scan) and broadcast back.
    Q("ts_seasonal_index",
      Some("""WITH h AS (SELECT CAST(hour(ts) AS BIGINT) AS hr,
             |             CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
             |           FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st FROM h)
             |SELECT hr, n, s,
             |       CAST(round((CAST(s AS DOUBLE) / n)
             |            / (CAST(st AS DOUBLE) / nt) * 1e6) AS BIGINT) AS idx_e6
             |FROM h CROSS JOIN t ORDER BY hr""".stripMargin),
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("long").as("s"))
        val t = h.agg(sum("n").cast("long").as("nt"), sum("s").cast("long").as("st"))
        h.crossJoin(broadcast(t))
          .select(col("hr"), col("n"), col("s"),
            expr("""CAST(round((CAST(s AS DOUBLE) / n)
                   | / (CAST(st AS DOUBLE) / nt) * 1e6) AS BIGINT)""".stripMargin)
              .as("idx_e6"))
          .orderBy("hr")
      }),

    // lag-1 autocorrelation of event cents per user: consecutive
    // (prev, cur) pairs from ONE window pass (the same shuffle the
    // series already needs), then Pearson r over the pairs from exact
    // power sums — cents² sums stay within BIGINT (≤10¹⁰ per pair).
    // Users need ≥3 pairs to report (degenerate denominators excluded
    // structurally, not by float comparison).
    Q("ts_autocorr",
      Some("""WITH p AS (SELECT user_id,
             |             lag(CAST(round(value * 100) AS BIGINT))
             |               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x,
             |             CAST(round(value * 100) AS BIGINT) AS y
             |           FROM events),
             |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(x * y) AS BIGINT) AS sxy,
             |             CAST(sum(x * x) AS BIGINT) AS sxx,
             |             CAST(sum(y * y) AS BIGINT) AS syy
             |      FROM p WHERE x IS NOT NULL GROUP BY 1)
             |SELECT user_id, n,
             |       CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             |            * 1e6) AS BIGINT) AS r1_e6
             |FROM g WHERE n >= 3 ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("y"))
          .withColumn("x", lag("y", 1).over(w))
          .filter(col("x").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("x").cast("long").as("sx"), sum("y").cast("long").as("sy"),
            sum(expr("x * y")).cast("long").as("sxy"),
            sum(expr("x * x")).cast("long").as("sxx"),
            sum(expr("y * y")).cast("long").as("syy"))
          .filter(col("n") >= 3)
          .select(col("user_id"), col("n"),
            expr("""CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   | / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   | * 1e6) AS BIGINT)""".stripMargin).as("r1_e6"))
          .orderBy("user_id")
      }),

    // leave-one-out mean target encoding of market segment against
    // order cents — the standard leakage-free categorical encoder.
    // Per-segment (Σ, n) reduce in one aggregation and BROADCAST back
    // to the fact rows; each row's code is (Σ − own)/(n − 1) — exact
    // integer operands, one rounded division (nullif-guarded: a
    // singleton segment yields NULL in both engines rather than an
    // engine-divergent inf/error). No self-join, no window: the fact
    // is touched exactly twice (reduce + encode) at any scale.
    Q("feature_target_encode",
      Some("""WITH j AS (SELECT o_orderkey AS ok, c_mktsegment AS seg,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS y
             |           FROM orders JOIN customer ON o_custkey = c_custkey),
             |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(y) AS BIGINT) AS s
             |      FROM j GROUP BY 1)
             |SELECT j.ok, j.seg, j.y,
             |       CAST(round(CAST(g.s - j.y AS DOUBLE) / nullif(g.n - 1, 0)) AS BIGINT)
             |         AS loo_cents
             |FROM j JOIN g ON j.seg = g.seg
             |ORDER BY j.ok""".stripMargin),
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey").as("ok"), col("c_mktsegment").as("seg"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
        val g = j.groupBy("seg")
          .agg(count(lit(1)).cast("long").as("n"), sum("y").cast("long").as("s"))
        j.join(broadcast(g), "seg")
          .select(col("ok"), col("seg"), col("y"),
            expr("CAST(round(CAST(s - y AS DOUBLE) / nullif(n - 1, 0)) AS BIGINT)")
              .as("loo_cents"))
          .orderBy("ok")
      }),

    // late-arriving dimension: facts whose dimension row hasn't landed
    // yet (here: customers still at non-positive balance) resolve to an
    // explicit UNKNOWN member instead of dropping or nulling — the
    // left join keeps fact conservation, the flag drives reprocessing.
    // The filtered dim is UNHINTED (r9 policy: customer scales with
    // the corpus — a pinned broadcast is an executor OOM at 100 TB);
    // stats/AQE broadcast it while it fits, else the join shuffles.
    Q("join_late_dim",
      Some("""SELECT o.o_orderkey AS ok, o.o_custkey AS ck,
             |       coalesce(c.c_mktsegment, 'UNKNOWN') AS seg,
             |       CAST(c.c_custkey IS NULL AS BOOLEAN) AS late_dim
             |FROM orders o
             |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
             |  ON o.o_custkey = c.c_custkey
             |ORDER BY ok""".stripMargin),
      (s, d) => {
        val dim = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        Tables.orders(s, d)
          .join(dim, col("o_custkey") === col("c_custkey"), "left")
          .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
            coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("seg"),
            col("c_custkey").isNull.as("late_dim"))
          .orderBy("ok")
      }),

    // degree centrality over the verified near-dup graph (exact
    // Jaccard ≥ 0.7 edges — the same pair stream dedup_minhash pays
    // for): documents ranked by how many near-duplicates they have.
    // The edge list is sparse, so the both-directions explode +
    // count is a reduction over a tiny table.
    Q("graph_degree",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |e AS (SELECT ia, ib FROM pairs
             |      JOIN sizes sa ON sa.doc_id = pairs.ia
             |      JOIN sizes sb ON sb.doc_id = pairs.ib
             |      WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7)
             |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS degree
             |FROM (SELECT ia AS id FROM e UNION ALL SELECT ib FROM e) u
             |GROUP BY 1 ORDER BY degree DESC, doc_id""".stripMargin),
      (s, d) => {
        val e = graft.text.Dedup
          .nearDupPairs(Tables.documents(s, d), "doc_id", "text", 0.7)
        e.select(col("id_a").as("doc_id"))
          .unionAll(e.select(col("id_b").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).cast("long").as("degree"))
          .orderBy(col("degree").desc, col("doc_id"))
      }))
}
