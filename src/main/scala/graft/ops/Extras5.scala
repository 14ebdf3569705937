package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-2 operators: statistical mode, struct-column algebra,
  * exact-integer linear interpolation, triangle counting over the
  * near-dup graph, and rule-based stemming. All oracled; every float
  * leaves through the µ-scaled-integer door (SCALE.md policy).
  */
object Extras5 {

  def queries: Seq[Q] = Seq(
    // statistical mode with a deterministic tie-break (most frequent
    // value, ties → smallest value). Spelled relationally (count +
    // one window) instead of Spark's native mode(), whose tie choice
    // is partitioning-dependent — at 1000 executors the relational
    // spelling is the only reproducible one. Two shuffles total, both
    // on low-cardinality keys.
    Q("agg_mode",
      Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
             |          FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT l_returnflag, l_quantity, n, row_number() OVER (
             |        PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) AS rk
             |      FROM c)
             |SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_qty, n
             |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val counts = Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("n").desc, col("l_quantity").asc)
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("l_returnflag"),
            col("l_quantity").cast("long").as("mode_qty"), col("n"))
          .orderBy("l_returnflag")
      }),

    // struct-column algebra: min/max over struct(acctbal, name) is
    // lexicographic, so one aggregation yields argmin AND argmax with
    // their payloads — no self-join, no window over the full table.
    // to_json(named_struct(...)) exercises struct → JSON rendering.
    // The oracle spells the same semantics with windows.
    Q("struct_funcs",
      Some("""WITH r AS (SELECT c_nationkey, c_name, c_acctbal,
             |        row_number() OVER (PARTITION BY c_nationkey
             |          ORDER BY c_acctbal ASC, c_name ASC) AS rk_min,
             |        row_number() OVER (PARTITION BY c_nationkey
             |          ORDER BY c_acctbal DESC, c_name DESC) AS rk_max,
             |        count(*) OVER (PARTITION BY c_nationkey) AS n
             |      FROM customer)
             |SELECT a.c_nationkey, a.c_name AS poorest, a.c_acctbal AS poorest_bal,
             |       b.c_name AS richest, b.c_acctbal AS richest_bal,
             |       a.n AS n_cust, '{"n":' || a.n || '}' AS info_json
             |FROM r a JOIN r b ON a.c_nationkey = b.c_nationkey AND b.rk_max = 1
             |WHERE a.rk_min = 1 ORDER BY a.c_nationkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(min(struct(col("c_acctbal"), col("c_name"))).as("mn"),
          max(struct(col("c_acctbal"), col("c_name"))).as("mx"),
          count(lit(1)).as("n_cust"))
        .select(col("c_nationkey"),
          col("mn.c_name").as("poorest"), col("mn.c_acctbal").as("poorest_bal"),
          col("mx.c_name").as("richest"), col("mx.c_acctbal").as("richest_bal"),
          col("n_cust"),
          to_json(struct(col("n_cust").as("n"))).as("info_json"))
        .orderBy("c_nationkey")),

    // linear interpolation on the dense hourly grid (ts_resample's
    // gap-fill, but interpolating instead of forward-filling). All
    // math is exact BIGINT: values are µ-scaled ints (non-negative on
    // this corpus), the interp is the weighted form
    //   (vp·(tn−t) + vn·(t−tp)) div (tn−tp)
    // whose numerator is non-negative, so trunc-div == floor-div in
    // both engines. One shuffle on user_id; two window passes share
    // its sort.
    Q("ts_interp_linear",
      Some("""WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
             |                  date_trunc('hour', max(ts)) AS h1
             |           FROM events GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
             |      FROM b),
             |v AS (SELECT user_id, date_trunc('hour', ts) AS hr,
             |             sum(CAST(round(value * 1e6) AS BIGINT)) AS v6
             |      FROM events GROUP BY 1, 2),
             |f AS (SELECT g.user_id, g.hr,
             |        last_value(CASE WHEN v.v6 IS NOT NULL THEN g.hr END IGNORE NULLS) OVER wb AS tp,
             |        last_value(v.v6 IGNORE NULLS) OVER wb AS vp,
             |        first_value(CASE WHEN v.v6 IS NOT NULL THEN g.hr END IGNORE NULLS) OVER wf AS tn,
             |        first_value(v.v6 IGNORE NULLS) OVER wf AS vn
             |      FROM g LEFT JOIN v ON v.user_id = g.user_id AND v.hr = g.hr
             |      WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.hr
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |             wf AS (PARTITION BY g.user_id ORDER BY g.hr
             |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, hr,
             |       CAST(CASE WHEN tn = tp THEN vp
             |            ELSE (vp * (CAST(epoch(tn) AS BIGINT) - CAST(epoch(hr) AS BIGINT))
             |                + vn * (CAST(epoch(hr) AS BIGINT) - CAST(epoch(tp) AS BIGINT)))
             |                 // (CAST(epoch(tn) AS BIGINT) - CAST(epoch(tp) AS BIGINT)) END
             |            AS BIGINT) AS val_e6
             |FROM f WHERE tp IS NOT NULL AND tn IS NOT NULL
             |ORDER BY user_id, hr""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        // r16 (guide §2.4/§2.5): repartition by user_id BEFORE the
        // grid explode — the per-user (h0, h1) frame is |users| rows,
        // so the shuffle moves almost nothing and the ~700×-larger
        // exploded grid is BORN hash-partitioned by user_id at an
        // explicit scale-adaptive width (AQE would coalesce the tiny
        // map output to 1-3 partitions and serialize the explode +
        // both window sorts). The hourly side repartitions the same
        // way, so the join needs no further exchange AND its output
        // partitioning already satisfies both windows — the former
        // plan exchanged the full grid twice (join key, then window
        // key).
        val np = s.sparkContext.defaultParallelism
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .repartition(np, col("user_id"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("hr"))
        val hourly = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hr"))
          .agg(sum(round(col("value") * 1e6).cast("long")).as("v6"))
          .repartition(np, col("user_id"))
        // both lookups are RUNNING frames: the next-observation pass
        // orders DESC instead of using (currentRow, unboundedFollowing)
        // — Spark's unbounded-FOLLOWING frame re-scans the partition
        // per row (O(n·partition), measured 62 s at sf0.1 vs 4 s for
        // this form); the descending running frame is incremental.
        val wb = Window.partitionBy("user_id").orderBy(col("hr").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy("user_id").orderBy(col("hr").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"),
            last(when(col("v6").isNotNull, col("hr")), ignoreNulls = true).over(wb).as("tp"),
            last(col("v6"), ignoreNulls = true).over(wb).as("vp"),
            last(when(col("v6").isNotNull, col("hr")), ignoreNulls = true).over(wf).as("tn"),
            last(col("v6"), ignoreNulls = true).over(wf).as("vn"))
          .filter(col("tp").isNotNull && col("tn").isNotNull)
          .select(col("user_id"), col("hr"),
            when(col("tn") === col("tp"), col("vp"))
              .otherwise(expr("""(vp * (unix_timestamp(tn) - unix_timestamp(hr))
                               | + vn * (unix_timestamp(hr) - unix_timestamp(tp)))
                               | div (unix_timestamp(tn) - unix_timestamp(tp))""".stripMargin))
              .as("val_e6"))
          .orderBy("user_id", "hr")
      }),

    // triangle enumeration over the verified near-dup graph: edges are
    // the exact-Jaccard ≥ 0.7 pairs (id_a < id_b), a triangle is
    // e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a < b < c. The edge set is tiny
    // relative to the corpus (near-dup graphs are sparse), so both
    // joins broadcast; the expensive part — pair generation — is the
    // one LSH-bucketed shuffle dedup_minhash already pays.
    Q("graph_triangles",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |e AS (SELECT ia AS a, ib AS b FROM pairs
             |      JOIN sizes sa ON sa.doc_id = pairs.ia
             |      JOIN sizes sb ON sb.doc_id = pairs.ib
             |      WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7)
             |SELECT e1.a AS a, e1.b AS b, e2.b AS c
             |FROM e e1 JOIN e e2 ON e1.b = e2.a
             |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
             |ORDER BY 1, 2, 3""".stripMargin),
      (s, d) => {
        val e = graft.text.Dedup
          .nearDupPairs(Tables.documents(s, d), "doc_id", "text", 0.7)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        val e1 = e.as("e1"); val e2 = e.as("e2"); val e3 = e.as("e3")
        e1.join(e2, col("e1.b") === col("e2.a"))
          .join(e3, col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
          .orderBy("a", "b", "c")
      }),

    // string-manipulation battery #3: casing, splicing, character
    // mapping, padding — all codegen'd scalars fused into the scan.
    Q("str_funcs3",
      Some("""SELECT c_custkey,
             |       upper(substring(c_name, 1, 1)) ||
             |         lower(substring(c_name, 2)) AS initcapped,
             |       substring(c_name, 1, 9) || 'XX' ||
             |         substring(c_name, 12) AS overlaid,
             |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
             |       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
             |       repeat('-', CAST(c_custkey % 5 AS INTEGER)) AS dashes
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d).select(col("c_custkey"),
        initcap(lower(col("c_name"))).as("initcapped"),
        overlay(col("c_name"), lit("XX"), lit(10)).as("overlaid"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        expr("repeat('-', CAST(c_custkey % 5 AS INT))").as("dashes"))
        .orderBy("c_custkey")),

    // sketch-error CONTRACTS: approximate aggregates can't hash-match
    // an exact oracle, but their PUBLISHED error bounds can — the
    // query computes sketch AND exact answer and asserts the bound,
    // so the oracle pins the contract (all-true), not the sketch bits.
    // approx_percentile(acc=1000): rank error ≤ n/1000 (+1 slack for
    // ties/rounding).
    Q("agg_approx_bound",
      Some("""SELECT l_returnflag, TRUE AS within_bound
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val approx = li.groupBy("l_returnflag")
          .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50a"),
            count(lit(1)).as("n"))
        li.join(broadcast(approx), "l_returnflag")
          .groupBy(col("l_returnflag"), col("p50a"), col("n"))
          .agg(count(when(col("l_extendedprice") <= col("p50a"), 1)).as("rnk"))
          .select(col("l_returnflag"),
            (abs(col("rnk") - col("n") / 2) <= col("n") / 1000 + 1)
              .as("within_bound"))
          .orderBy("l_returnflag")
      }),

    // HLL++ relative-error contract: default rsd 0.05 → assert
    // |approx − exact| ≤ 3·rsd·exact (3σ). Same pattern: the oracle
    // checks the GUARANTEE, the sketch stays free to vary by merge
    // order.
    Q("agg_hll_bound",
      Some("""SELECT l_returnflag, TRUE AS within_bound
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("a"),
          count_distinct(col("l_partkey")).as("e"))
        .select(col("l_returnflag"),
          (abs(col("a") - col("e")).cast("double") <=
            col("e").cast("double") * 0.15).as("within_bound"))
        .orderBy("l_returnflag")),

    // calendar-dimension join: a generated day spine (sequence — no
    // driver loop, no calendar table to maintain) left-joins daily
    // order stats so silent zero days SURFACE as zeros — the
    // gap-revealing join every ops dashboard needs. Day-of-week from
    // pure modular arithmetic on a pinned Sunday epoch (engine date
    // kernels disagree on dow numbering; datediff % 7 cannot).
    Q("ts_calendar_join",
      Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             |                  CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
             |cal AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |        FROM b),
             |o AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n,
             |             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
             |      FROM orders GROUP BY 1)
             |SELECT cal.day,
             |       CAST(((date_diff('day', DATE '1995-01-01', cal.day) % 7) + 7) % 7 AS BIGINT) AS dow,
             |       ((date_diff('day', DATE '1995-01-01', cal.day) % 7) + 7) % 7 IN (0, 6) AS is_weekend,
             |       CAST(coalesce(o.n, 0) AS BIGINT) AS n,
             |       CAST(coalesce(o.rev_cents, 0) AS BIGINT) AS rev_cents
             |FROM cal LEFT JOIN o ON o.day = cal.day
             |ORDER BY cal.day""".stripMargin),
      (s, d) => {
        val orders = Tables.orders(s, d)
        val spine = orders
          .agg(min(col("o_orderdate").cast("date")).as("d0"),
            max(col("o_orderdate").cast("date")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
        val daily = orders
          .groupBy(col("o_orderdate").cast("date").as("day"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
        // floored modulus: both engines' % truncates toward zero, so a
        // day BEFORE the pinned epoch would yield dow = -1..-6 and
        // silently drop its weekend flag; pmod keeps dow in [0,6] for
        // any date range, not just the current corpus's (min happens
        // to equal the epoch today — one earlier row would flip flags)
        val dnum = pmod(datediff(col("day"), lit("1995-01-01").cast("date")), lit(7))
        spine.join(daily, Seq("day"), "left")
          .select(col("day"), dnum.cast("long").as("dow"),
            dnum.isin(0, 6).as("is_weekend"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("rev_cents"), lit(0L)).as("rev_cents"))
          .orderBy("day")
      }),

    // column-level encryption roundtrip: AES-128-ECB (deterministic —
    // no IV, so retries/re-executions produce identical bytes; GCM's
    // random IV would break both determinism and the oracle) encrypt →
    // decrypt returns the plaintext, and the ciphertext length is the
    // PKCS#7-padded block count, which the oracle computes
    // arithmetically — over the UTF-8 BYTE length (strlen), not the
    // character count: AES pads the encoded bytes, so length(text)
    // would silently diverge on the first non-ASCII document. The
    // codegen'd expression pair runs fused in the scan — the shape of
    // tokenization/pseudonymization at rest.
    Q("crypto_roundtrip",
      Some("""SELECT doc_id,
             |       text AS roundtrip,
             |       CAST((strlen(text) // 16 + 1) * 16 AS BIGINT) AS cipher_len
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        Tables.documents(s, d).select(col("doc_id"),
          expr("CAST(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'), " +
            "'0123456789abcdef', 'ECB') AS STRING)").as("roundtrip"),
          length(expr("aes_encrypt(text, '0123456789abcdef', 'ECB')"))
            .cast("long").as("cipher_len"))
          .orderBy("doc_id")
      }),

    // multi-grain time rollup: year/month/day revenue in ONE pass
    // (ROLLUP over the derived calendar hierarchy — partial aggregates
    // feed the coarser grains, no re-scan per grain). Exact cent sums;
    // grain labeled from grouping().
    Q("ts_multigrain",
      Some("""SELECT CAST(y AS BIGINT) AS y, CAST(m AS BIGINT) AS m,
             |       CAST(d AS BIGINT) AS d,
             |       CASE WHEN grouping(y) = 1 THEN 'all'
             |            WHEN grouping(m) = 1 THEN 'year'
             |            WHEN grouping(d) = 1 THEN 'month'
             |            ELSE 'day' END AS grain,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
             |       count(*) AS n
             |FROM (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
             |             day(o_orderdate) AS d, o_totalprice FROM orders) t
             |GROUP BY ROLLUP (y, m, d)
             |ORDER BY grain, y NULLS FIRST, m NULLS FIRST, d NULLS FIRST""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"), col("o_totalprice"))
        .rollup("y", "m", "d")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"),
          count(lit(1)).as("n"),
          grouping(col("y")).as("gy"), grouping(col("m")).as("gm"),
          grouping(col("d")).as("gd"))
        .select(col("y").cast("long").as("y"), col("m").cast("long").as("m"),
          col("d").cast("long").as("d"),
          when(col("gy") === 1, "all")
            .when(col("gm") === 1, "year")
            .when(col("gd") === 1, "month")
            .otherwise("day").as("grain"),
          col("rev_cents"), col("n"))
        .orderBy(col("grain"), col("y").asc_nulls_first,
          col("m").asc_nulls_first, col("d").asc_nulls_first)),

    // customer-value deciles: per-customer exact revenue, then the
    // EXACT ntile(10) assignment via ScaleRank.withGlobalRank — range-
    // bucketed two-phase ranking (approx_percentile cutpoints +
    // per-range row_number + broadcast offsets), bit-identical to the
    // oracle's ntile but with no single-partition sort even at 10⁹
    // customers — then per-decile stats.
    Q("agg_deciles",
      Some("""WITH r AS (SELECT o_custkey,
             |            sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
             |          FROM orders GROUP BY 1),
             |d AS (SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile FROM r)
             |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_cust,
             |       CAST(min(rev) AS BIGINT) AS min_cents,
             |       CAST(max(rev) AS BIGINT) AS max_cents,
             |       CAST(sum(rev) AS BIGINT) AS sum_cents
             |FROM d GROUP BY 1 ORDER BY decile""".stripMargin),
      (s, d) => {
        val rev = Tables.orders(s, d).groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        ScaleRank.withGlobalRank(rev, "rev", "o_custkey", nName = Some("__n"))
          .withColumn("decile",
            ScaleRank.ntileFromRank(col("rk"), col("__n"), 10))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_cust"), min(col("rev")).as("min_cents"),
            max(col("rev")).as("max_cents"), sum(col("rev")).as("sum_cents"))
          .orderBy("decile")
      }),

    // local-maximum peak detection: one lag + one lead over the
    // per-type series (one shuffle, one sort, both windows share it).
    // Strict > on verbatim doubles — no float manufacturing, so the
    // oracle is exact.
    Q("ts_peaks",
      Some("""SELECT event_id, event_type, value FROM (
             |  SELECT event_id, event_type, value,
             |         lag(value)  OVER w AS pv,
             |         lead(value) OVER w AS nv
             |  FROM events
             |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)) t
             |WHERE pv IS NOT NULL AND nv IS NOT NULL
             |  AND value > pv AND value > nv
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("ts"), col("value"),
            lag(col("value"), 1).over(w).as("pv"),
            lead(col("value"), 1).over(w).as("nv"))
          .filter(col("pv").isNotNull && col("nv").isNotNull &&
            col("value") > col("pv") && col("value") > col("nv"))
          .select("event_id", "event_type", "value")
          .orderBy("event_id")
      }),

    // robust outlier detection via median absolute deviation: two
    // exact medians on the µ-int grid (median of BIGINTs interpolates
    // to at worst an exact .5 — identical doubles in both engines),
    // then |v − med| > 3·MAD. Two aggregation passes over the typed
    // series + one broadcast-back join per pass; no sort survives to
    // the report.
    Q("ts_anomaly_mad",
      Some("""WITH v AS (SELECT event_type,
             |            CAST(round(value * 1e6) AS BIGINT) AS v6 FROM events),
             |m AS (SELECT event_type, median(v6) AS med FROM v GROUP BY 1),
             |dev AS (SELECT v.event_type, v.v6, m.med, abs(v.v6 - m.med) AS ad
             |        FROM v JOIN m ON v.event_type = m.event_type),
             |md AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
             |SELECT dev.event_type, CAST(dev.med AS DOUBLE) AS med,
             |       CAST(md.mad AS DOUBLE) AS mad,
             |       CAST(count(*) FILTER (WHERE dev.ad > 3 * md.mad) AS BIGINT) AS n_outliers,
             |       count(*) AS n
             |FROM dev JOIN md ON dev.event_type = md.event_type
             |GROUP BY dev.event_type, dev.med, md.mad
             |ORDER BY dev.event_type""".stripMargin),
      (s, d) => {
        val v = Tables.events(s, d)
          .select(col("event_type"), round(col("value") * 1e6).cast("long").as("v6"))
        // grouped medians via the distributed per-group CDF (halves on
        // the µ-int grid interpolate FP-exactly — see ScaleRank.
        // groupedQuantilesCont); the builtin median buffers the group
        val m = ScaleRank.groupedQuantilesCont(v, "event_type", "v6",
          Seq(1 -> 2), Seq("med"), x => floor(x / 65536))
        val dev = v.join(broadcast(m), "event_type")
          .withColumn("ad", abs(col("v6") - col("med")))
        val md = ScaleRank.groupedQuantilesCont(
          dev.select("event_type", "ad"), "event_type", "ad",
          Seq(1 -> 2), Seq("mad"), x => floor(x / 65536))
        dev.join(broadcast(md), "event_type")
          .groupBy(col("event_type"), col("med"), col("mad"))
          .agg(count(when(col("ad") > col("mad") * 3, 1)).as("n_outliers"),
            count(lit(1)).as("n"))
          .select(col("event_type"), col("med").cast("double").as("med"),
            col("mad").cast("double").as("mad"),
            col("n_outliers"), col("n"))
          .orderBy("event_type")
      }),

    // last-touch attribution: each purchase credited to the user's
    // most recent prior view — a running last-non-null over the event
    // stream (one shuffle on user, one in-partition sort), never a
    // per-purchase lookback join. The backbone of marketing/consent
    // attribution at event-log scale.
    Q("seq_attribution",
      Some("""SELECT event_id AS purchase_id, attributed_view
             |FROM (SELECT event_id, event_type,
             |        last_value(CASE WHEN event_type = 'view' THEN event_id END
             |          IGNORE NULLS) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS attributed_view
             |      FROM events) t
             |WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("user_id"), col("ts"))
          .withColumn("attributed_view",
            last(when(col("event_type") === "view", col("event_id")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("attributed_view"))
          .orderBy("purchase_id")
      }),

    // period-over-period growth: monthly revenue (exact cent sums) +
    // lag + sign-split µ-scaled growth ratio — the abs/sign split
    // keeps the floor division on a non-negative numerator, where
    // both engines agree (negative integral division truncates in
    // Spark but floors in DuckDB). The window runs over the ~few-dozen
    // aggregated rows, not the fact table.
    Q("ts_period_over_period",
      Some("""WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
             |            sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
             |          FROM orders GROUP BY 1),
             |l AS (SELECT mon, CAST(rev_cents AS BIGINT) AS rev_cents,
             |        CAST(lag(rev_cents) OVER (ORDER BY mon) AS BIGINT) AS prev_cents
             |      FROM m)
             |SELECT mon, rev_cents, prev_cents,
             |       CASE WHEN prev_cents IS NULL THEN NULL
             |            WHEN rev_cents >= prev_cents
             |              THEN CAST(((rev_cents - prev_cents) * 1000000) // prev_cents AS BIGINT)
             |            ELSE CAST(-(((prev_cents - rev_cents) * 1000000) // prev_cents) AS BIGINT)
             |       END AS growth_e6
             |FROM l ORDER BY mon""".stripMargin),
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("mon"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_cents"))
        val w = Window.orderBy("mon")
        monthly.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
          .withColumn("growth_e6", expr(
            """CASE WHEN prev_cents IS NULL THEN NULL
              |     WHEN rev_cents >= prev_cents
              |       THEN ((rev_cents - prev_cents) * 1000000L) div prev_cents
              |     ELSE -(((prev_cents - rev_cents) * 1000000L) div prev_cents)
              |END""".stripMargin))
          .orderBy("mon")
      }),

    // deterministic array aggregation: collect_list/collect_set are
    // partitioning-order-dependent — sort_array makes the aggregate
    // reproducible at any parallelism, and the canonical string form
    // keeps the oracle engine-neutral. The per-group array is bounded
    // (distinct segments), never the row stream.
    Q("array_collect_sorted",
      Some("""SELECT c_nationkey,
             |       array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments,
             |       CAST(count(*) AS BIGINT) AS n_cust
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_nationkey")),

    // snapshot reconciliation: two table versions diffed in ONE full
    // outer join on the key — added / removed / changed / unchanged
    // per row, aggregated to a count report. Payload comparison hashes
    // inside the join (never a second pass); at 100 TB both snapshots
    // shuffle once on the key and the report is 4 rows. (v_old drops
    // orderkey%13=0, v_new drops %11=0 and re-prices %7=0 — a
    // deterministic stand-in for yesterday/today.)
    Q("pipeline_snapshot_diff",
      Some("""WITH v_old AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders
             |              WHERE o_orderkey % 13 <> 0),
             |v_new AS (SELECT o_orderkey AS k,
             |                 CASE WHEN o_orderkey % 7 = 0 THEN 0.0
             |                      ELSE o_totalprice END AS p
             |          FROM orders WHERE o_orderkey % 11 <> 0)
             |SELECT CASE WHEN o.k IS NULL THEN 'added'
             |            WHEN n.k IS NULL THEN 'removed'
             |            WHEN o.p <> n.p THEN 'changed'
             |            ELSE 'unchanged' END AS change_type,
             |       count(*) AS n
             |FROM v_old o FULL OUTER JOIN v_new n ON o.k = n.k
             |GROUP BY 1 ORDER BY change_type""".stripMargin),
      (s, d) => {
        val orders = Tables.orders(s, d)
        val vOld = orders.filter(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        val vNew = orders.filter(col("o_orderkey") % 11 =!= 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 7 === 0, lit(0.0))
              .otherwise(col("o_totalprice")).as("p"))
        vOld.as("o").join(vNew.as("n"), col("o.k") === col("n.k"), "full_outer")
          .select(
            when(col("o.k").isNull, "added")
              .when(col("n.k").isNull, "removed")
              .when(col("o.p") =!= col("n.p"), "changed")
              .otherwise("unchanged").as("change_type"))
          .groupBy("change_type").agg(count(lit(1)).as("n"))
          .orderBy("change_type")
      }),

    // markup stripping for corpus cleaning: HTML tags out, markdown
    // links collapsed to their anchor text, whitespace renormalized —
    // pure codegen'd regexp_replace chain fused into the scan. (The
    // corpus is plain text, so the markup is synthesized first; the
    // oracle strips the same synthesis with RE2 \\1 backrefs where
    // Spark uses Java's $1.)
    Q("text_strip_markup",
      Some("""SELECT doc_id,
             |  trim(regexp_replace(regexp_replace(regexp_replace(
             |    '<h1>' || upper(lang) || '</h1> <p>' || text || '</p> [ref](http://x/' || doc_id || ')',
             |    '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
             |    '<[^>]*>', '', 'g'),
             |    ' +', ' ', 'g')) AS clean
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("<h1>"), upper(col("lang")), lit("</h1> <p>"), col("text"),
            lit("</p> [ref](http://x/"), col("doc_id"), lit(")")).as("marked"))
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(regexp_replace(col("marked"),
            "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"),
            "<[^>]*>", ""),
            " +", " ")).as("clean"))
        .orderBy("doc_id")),

    // running distinct-user count per event type: first-occurrence
    // flag (row_number over (type, user) = 1) then a running sum —
    // two O(n log n) window passes, never a per-row set scan. The
    // incremental form of "how many unique users so far", the curve
    // every growth dashboard draws.
    Q("window_running_distinct",
      Some("""SELECT event_id,
             |       CAST(sum(first_seen) OVER (PARTITION BY event_type
             |         ORDER BY ts, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS users_so_far
             |FROM (SELECT event_id, event_type, ts,
             |        CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
             |               ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
             |      FROM events) t
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val wFirst = Window.partitionBy("event_type", "user_id")
          .orderBy(col("ts"), col("event_id"))
        val wRun = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("ts"), col("user_id"))
          .withColumn("first_seen",
            when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
          .select(col("event_id"),
            sum(col("first_seen")).over(wRun).as("users_so_far"))
          .orderBy("event_id")
      }),

    // ratio-to-report: each (flag, status) cell's share of its flag's
    // total — the aggregate feeds a window over its own (already tiny)
    // output, so the window sees grouped rows, never the fact table.
    // Share is exact: (cnt·1e6) div total.
    Q("agg_ratio_to_report",
      Some("""WITH c AS (SELECT l_returnflag, l_linestatus, count(*) AS n
             |          FROM lineitem GROUP BY 1, 2)
             |SELECT l_returnflag, l_linestatus, n,
             |       CAST((n * 1000000) // sum(n) OVER (PARTITION BY l_returnflag)
             |            AS BIGINT) AS share_e6
             |FROM c ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("l_returnflag")
        cells.select(col("l_returnflag"), col("l_linestatus"), col("n"),
          expr("n * 1000000L").as("scaled"), sum(col("n")).over(w).as("tot"))
          .select(col("l_returnflag"), col("l_linestatus"), col("n"),
            expr("scaled div tot").as("share_e6"))
          .orderBy("l_returnflag", "l_linestatus")
      }),

    // shuffle-key skew report: for each candidate join/agg key, the
    // hottest key's share vs a uniform spread (skew_e6 = max·keys/rows,
    // µ-scaled, 1e6 = perfectly uniform) — the number that decides
    // salting / AQE skew-join BEFORE the 100 TB shuffle runs. One
    // map-side-combined count per key column; the report is 3 rows.
    Q("dq_skew_report",
      Some("""WITH s1 AS (SELECT count(*) AS n FROM orders GROUP BY o_custkey),
             |s2 AS (SELECT count(*) AS n FROM lineitem GROUP BY l_partkey),
             |s3 AS (SELECT count(*) AS n FROM lineitem GROUP BY l_suppkey)
             |SELECT 'orders.o_custkey' AS key_col, CAST(count(*) AS BIGINT) AS n_keys,
             |       CAST(sum(n) AS BIGINT) AS n_rows, CAST(max(n) AS BIGINT) AS max_cnt,
             |       CAST((max(n) * count(*) * 1000000) // sum(n) AS BIGINT) AS skew_e6
             |FROM s1
             |UNION ALL
             |SELECT 'lineitem.l_partkey', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT),
             |       CAST(max(n) AS BIGINT), CAST((max(n) * count(*) * 1000000) // sum(n) AS BIGINT)
             |FROM s2
             |UNION ALL
             |SELECT 'lineitem.l_suppkey', CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT),
             |       CAST(max(n) AS BIGINT), CAST((max(n) * count(*) * 1000000) // sum(n) AS BIGINT)
             |FROM s3
             |ORDER BY key_col""".stripMargin),
      (s, d) => {
        def report(df: org.apache.spark.sql.DataFrame, key: String, label: String) =
          df.groupBy(key).agg(count(lit(1)).as("n"))
            .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
              max(col("n")).as("max_cnt"))
            .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
              col("max_cnt"),
              expr("(max_cnt * n_keys * 1000000L) div n_rows").as("skew_e6"))
        report(Tables.orders(s, d), "o_custkey", "orders.o_custkey")
          .union(report(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey"))
          .union(report(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey"))
          .orderBy("key_col")
      }),

    // exact heavy hitters with a RELATIVE threshold (≥ 0.1% of the
    // group): per-(group, value) counts map-side combine, group totals
    // broadcast back — both shuffles key on low-cardinality columns,
    // and the threshold scales with the data so the query means the
    // same thing at sf0.001 and at 100 TB.
    Q("agg_heavy_hitters",
      Some("""WITH c AS (SELECT l_returnflag, l_suppkey, count(*) AS n
             |          FROM lineitem GROUP BY 1, 2),
             |t AS (SELECT l_returnflag, count(*) AS total FROM lineitem GROUP BY 1)
             |SELECT c.l_returnflag, c.l_suppkey, c.n
             |FROM c JOIN t ON c.l_returnflag = t.l_returnflag
             |WHERE c.n * 1000 >= t.total
             |ORDER BY c.l_returnflag, c.l_suppkey""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val counts = li.groupBy("l_returnflag", "l_suppkey")
          .agg(count(lit(1)).as("n"))
        val totals = li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("total"))
        counts.join(broadcast(totals), "l_returnflag")
          .filter(col("n") * 1000 >= col("total"))
          .select(col("l_returnflag"), col("l_suppkey"), col("n"))
          .orderBy("l_returnflag", "l_suppkey")
      }),

    // damped PageRank over the near-dup graph, 4 iterations, ALL
    // arithmetic exact BIGINT on the 1e-6 grid: contrib = r div deg,
    // r' = 150000 + (17·Σcontrib) div 20 — floor division of
    // non-negatives is engine- and partitioning-invariant, so the
    // iterative Spark loop hash-matches DuckDB's unrolled CTE exactly.
    // Per iteration: one broadcast-sized join + one aggregation
    // shuffle on dst; ranks are localCheckpointed so the plan doesn't
    // grow with iteration count (the connectedComponents lesson).
    Q("graph_pagerank",
      Some {
        val base = s"""${graft.text.DedupQueries.jaccardCtePrefix},
          |e AS (SELECT ia AS a, ib AS b FROM pairs
          |      JOIN sizes sa ON sa.doc_id = pairs.ia
          |      JOIN sizes sb ON sb.doc_id = pairs.ib
          |      WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7),
          |sym AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
          |deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY 1),
          |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)""".stripMargin
        val iters = (1 to 4).map { i =>
          s"""r$i AS (SELECT d.node, CAST(150000 + (17 * coalesce(s.inc, 0)) // 20 AS BIGINT) AS r
             |  FROM deg d LEFT JOIN (
             |    SELECT sym.dst AS node, sum(p.r // dp.deg) AS inc
             |    FROM sym JOIN r${i - 1} p ON p.node = sym.src
             |    JOIN deg dp ON dp.node = sym.src
             |    GROUP BY sym.dst) s ON s.node = d.node)""".stripMargin
        }.mkString(",\n")
        s"""$base,
           |$iters
           |SELECT d.node AS doc_id, d.deg, r4.r AS rank_e6
           |FROM deg d JOIN r4 ON r4.node = d.node
           |ORDER BY doc_id""".stripMargin
      },
      (s, d) => {
        val e = graft.text.Dedup
          .nearDupPairs(Tables.documents(s, d), "doc_id", "text", 0.7)
          .select(col("id_a").as("a"), col("id_b").as("b"))
        // localCheckpoint, not cache(): the CacheManager pins cached
        // frames until an explicit unpersist (which a lazily-returned
        // query has no post-collect hook to issue), so repeated runs in
        // one JVM would accumulate edge/degree blocks for the context
        // lifetime. Checkpoint blocks are ContextCleaner-reclaimed once
        // the frames become unreachable — same eager-materialize reuse
        // across the 4 iterations, zero leak.
        val sym = e.select(col("a").as("src"), col("b").as("dst"))
          .union(e.select(col("b").as("src"), col("a").as("dst")))
          .localCheckpoint()
        val deg = sym.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg")).localCheckpoint()
        var ranks = deg.select(col("node"), lit(1000000L).as("r"))
        for (_ <- 1 to 4) {
          val contrib = ranks.join(deg, "node")
            .select(col("node"), expr("r div deg").as("c"))
          val inc = sym.join(contrib, sym("src") === contrib("node"))
            .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
          ranks = deg.select(col("node"))
            .join(inc, col("node") === col("dst"), "left")
            .select(col("node"),
              (lit(150000L) + expr("(17 * coalesce(inc, 0L)) div 20")).as("r"))
            .localCheckpoint()
        }
        deg.join(ranks, "node")
          .select(col("node").as("doc_id"), col("deg"), col("r").as("rank_e6"))
          .orderBy("doc_id")
      }),

    // rule-based suffix stemming (Porter step-1-ish) + stem-level
    // vocabulary: tokenize, stem each token with the first matching
    // rule, count occurrences and distinct surface forms per stem.
    // Pure string CASE logic — byte-identical across engines — and
    // one explode + one aggregation shuffle.
    Q("text_stem",
      Some("""WITH t AS (SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS tok
             |          FROM documents),
             |s AS (SELECT tok,
             |        CASE WHEN tok LIKE '%ing' AND length(tok) > 5 THEN substring(tok, 1, length(tok) - 3)
             |             WHEN tok LIKE '%ed'  AND length(tok) > 4 THEN substring(tok, 1, length(tok) - 2)
             |             WHEN tok LIKE '%ly'  AND length(tok) > 4 THEN substring(tok, 1, length(tok) - 2)
             |             WHEN tok LIKE '%s' AND tok NOT LIKE '%ss' AND length(tok) > 3
             |                  THEN substring(tok, 1, length(tok) - 1)
             |             ELSE tok END AS stem
             |      FROM t)
             |SELECT stem, count(*) AS n_tokens, count(DISTINCT tok) AS n_forms
             |FROM s GROUP BY stem ORDER BY stem""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), " +")).as("tok"))
        .withColumn("stem", expr(
          """CASE WHEN tok LIKE '%ing' AND length(tok) > 5 THEN substring(tok, 1, length(tok) - 3)
            |     WHEN tok LIKE '%ed'  AND length(tok) > 4 THEN substring(tok, 1, length(tok) - 2)
            |     WHEN tok LIKE '%ly'  AND length(tok) > 4 THEN substring(tok, 1, length(tok) - 2)
            |     WHEN tok LIKE '%s' AND tok NOT LIKE '%ss' AND length(tok) > 3
            |          THEN substring(tok, 1, length(tok) - 1)
            |     ELSE tok END""".stripMargin))
        .groupBy("stem")
        .agg(count(lit(1)).as("n_tokens"), count_distinct(col("tok")).as("n_forms"))
        .orderBy("stem"))
  )
}
