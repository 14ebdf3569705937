package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 surface widening: exact median, bitmap-index distinct
  * counting, the binned interval join (the scalable plan for range
  * predicates with NO equi-key), URL parsing, batch sessionization at
  * session granularity, and the high-watermark incremental-aggregation
  * pattern every production ETL eventually needs.
  *
  * Reference scope note: the reference (thewiin/aws-saas-etl) has no
  * analytics operators at all (SURVEY §2.2, grep-verified); these are
  * [EXT] rows mandated by BASELINE.json's north_star.
  */
object Extras4 {

  def queries: Seq[Q] = Seq(
    // exact interpolated median per group. Both engines interpolate the
    // even-count case as lo + (hi-lo)*0.5; micro-scaling to BIGINT
    // absorbs any last-ulp divergence of that double arithmetic.
    // Scale note: median is NOT partially aggregable — Spark plans a
    // full sort-based aggregate per group; at 100 TB use
    // approx_percentile, or ScaleRank.groupedQuantilesCont when
    // exactness is contractual (this query stays on the builtin as the
    // surface demo).
    Q("agg_median",
      Some("""SELECT o_orderpriority,
             |       CAST(round(median(o_totalprice) * 1e6) AS BIGINT) AS median_price_micro,
             |       count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            round(median(col("o_totalprice")) * lit(1e6)).cast("long")
              .as("median_price_micro"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      }),

    // distinct counting via the Spark 4 bitmap kernel: position keys
    // into 32k-bit bitmaps per (group, bucket), OR-merge, count bits.
    // Bit-exact (not a sketch) and mergeable across partitions/days —
    // the 100 TB pattern for pre-aggregated distinct-count cubes where
    // HLL's error is unacceptable. Oracle: plain COUNT(DISTINCT).
    Q("agg_bitmap_distinct",
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            expr("bitmap_bucket_number(o_custkey)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
            .as("bm"))
          .groupBy("o_orderpriority")
          .agg(sum(expr("bitmap_count(bm)")).as("n_custs"))
          .orderBy("o_orderpriority")
      }),

    // interval join with NO equi-key (customer balance within ±50 of a
    // supplier balance). The naive plan is BroadcastNestedLoopJoin —
    // O(n·m) compares and a broadcast that dies at scale. The scalable
    // plan: quantize the range into fixed-width bins, explode each
    // interval to the bins it overlaps (≤3 here), equi-join on bin,
    // then re-check the exact predicate. Same result set, but now it's
    // a shuffled hash join: O(n·k) with full cluster parallelism.
    Q("join_range_binned",
      Some("""SELECT c.c_custkey, s.s_suppkey FROM customer c
             |JOIN supplier s
             |  ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
             |ORDER BY c_custkey, s_suppkey""".stripMargin),
      (s, d) => {
        val binW = 64.0
        val sup = Tables.supplier(s, d)
          .withColumn("lo", col("s_acctbal") - 50)
          .withColumn("hi", col("s_acctbal") + 50)
          .withColumn("bin",
            explode(sequence(floor(col("lo") / binW), floor(col("hi") / binW))))
        val cust = Tables.customer(s, d)
          .withColumn("bin", floor(col("c_acctbal") / binW))
        cust.join(sup,
            cust("bin") === sup("bin") &&
              cust("c_acctbal").between(sup("lo"), sup("hi")))
          .select(col("c_custkey"), col("s_suppkey"))
          .orderBy("c_custkey", "s_suppkey")
      }),

    // URL scalar kernel: build a profile URL per customer, then take it
    // apart again with parse_url (HOST/PATH/keyed QUERY) + url_decode.
    // The oracle states the expected semantics directly from the base
    // columns (c_name's only non-URL-safe char is '#' → %23).
    Q("url_funcs",
      Some("""SELECT c_custkey,
             |       'shop.example.com' AS host,
             |       '/u/' || c_custkey || '/profile' AS path,
             |       c_mktsegment AS seg,
             |       replace(c_name, '#', '%23') AS name_enc,
             |       c_name AS name_dec
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d)
          .withColumn("url",
            concat(lit("https://shop.example.com/u/"), col("c_custkey"),
              lit("/profile?seg="), col("c_mktsegment"),
              lit("&name="), url_encode(col("c_name"))))
          .select(col("c_custkey"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg"),
            url_encode(col("c_name")).as("name_enc"),
            url_decode(url_encode(col("c_name"))).as("name_dec"))
          .orderBy("c_custkey")
      }),

    // batch sessionization at SESSION granularity (stream_sessions
    // reports per-user rollups): one session_window aggregate, one
    // shuffle on user_id. session_window.end = last event + gap, and
    // events exactly at the gap boundary MERGE (inclusive) — the
    // oracle splits strictly on `> INTERVAL 30 MINUTE`.
    Q("ts_sessionize",
      Some("""WITH g AS (
             |  SELECT user_id, ts,
             |         CASE WHEN lag(ts) OVER w IS NULL THEN 1
             |              WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
             |              ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |sess AS (
             |  SELECT user_id, ts,
             |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
             |  FROM g)
             |SELECT user_id,
             |       min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end,
             |       count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"))
          .orderBy("user_id", "session_start")
      }),

    // high-watermark incremental aggregation: the nightly-ETL pattern
    // where a persisted per-key state table absorbs only rows newer
    // than the watermark instead of rescanning history. Both legs are
    // keyed aggregates + one full-outer merge on the key — at 100 TB
    // the "base" leg is a table read, not a recompute, so cost tracks
    // the increment size. Exact value sums via micro-scaled BIGINT.
    Q("pipeline_incremental",
      Some("""WITH base AS (
             |  SELECT user_id, count(*) AS n,
             |         sum(CAST(round(value * 1e6) AS BIGINT)) AS v
             |  FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
             |  GROUP BY 1),
             |inc AS (
             |  SELECT user_id, count(*) AS n,
             |         sum(CAST(round(value * 1e6) AS BIGINT)) AS v
             |  FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
             |  GROUP BY 1)
             |SELECT coalesce(base.user_id, inc.user_id) AS user_id,
             |       CAST(coalesce(base.n, 0) + coalesce(inc.n, 0) AS BIGINT) AS n_events,
             |       CAST(coalesce(base.v, 0) + coalesce(inc.v, 0) AS BIGINT) AS value_micro,
             |       inc.user_id IS NOT NULL AS updated
             |FROM base FULL JOIN inc ON base.user_id = inc.user_id
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        val wm = lit("2024-01-20 00:00:00").cast("timestamp")
        val ev = Tables.events(s, d)
          .withColumn("v_micro", round(col("value") * 1e6).cast("long"))
        def rollup(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as("n"), sum("v_micro").as("v"))
        val base = rollup(ev.filter(col("ts") < wm))
        val inc = rollup(ev.filter(col("ts") >= wm))
        base.join(inc.withColumnRenamed("user_id", "i_user_id")
              .withColumnRenamed("n", "i_n").withColumnRenamed("v", "i_v"),
            col("user_id") === col("i_user_id"), "full_outer")
          .select(
            coalesce(col("user_id"), col("i_user_id")).as("user_id"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("i_n"), lit(0L)))
              .as("n_events"),
            (coalesce(col("v"), lit(0L)) + coalesce(col("i_v"), lit(0L)))
              .as("value_micro"),
            col("i_user_id").isNotNull.as("updated"))
          .orderBy("user_id")
      }),

    // crypto-hash + binary-encoding scalar battery: md5 / sha2-256 /
    // base64 round-trip / hex — content-addressing and wire-encoding
    // primitives (all codegen'd, embarrassingly parallel). hex case
    // differs across engines → lower() pinned on both sides.
    Q("hash_encode_funcs",
      Some("""SELECT c_custkey,
             |       md5(c_name) AS h_md5,
             |       sha256(c_name) AS h_sha256,
             |       base64(CAST(c_name AS BLOB)) AS enc_b64,
             |       CAST(from_base64(base64(CAST(c_name AS BLOB))) AS VARCHAR) AS rt_b64,
             |       lower(hex(CAST(c_mktsegment AS BLOB))) AS enc_hex
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d)
          .select(col("c_custkey"),
            md5(col("c_name")).as("h_md5"),
            sha2(col("c_name"), 256).as("h_sha256"),
            base64(col("c_name").cast("binary")).as("enc_b64"),
            decode(unbase64(base64(col("c_name").cast("binary"))), "UTF-8")
              .as("rt_b64"),
            lower(hex(col("c_mktsegment").cast("binary"))).as("enc_hex"))
          .orderBy("c_custkey")
      }),

    // feature scaling (the ML-preprocessing pass): per-segment z-score
    // AND min-max normalization in one window pass. All moments are
    // exact cent-integers; the closed forms (v·n−s)/√(n·s2−s²) and
    // (v−min)/(max−min) make the only float ops a final √/÷ evaluated
    // identically in both engines, reported on the 1e-6 grid. The
    // moment sums and the variance term n·s2−s² are 128-bit exact
    // integers (Spark DECIMAL(38,0), DuckDB HUGEINT — sum(BIGINT) is
    // already HUGEINT there): in 64-bit, n·s2−s² overflows once a
    // segment's cent-sum passes ~3e9 (≈30k customers — hit at the 10×
    // spot-bench, guaranteed at 100 TB) and the s2 sum itself dies at
    // ~1e7 rows/segment, while 128 bits hold s² to ~1e13 rows/segment
    // (≫ a 100 TB customer table). The only narrowing is the final
    // cast to double feeding √/÷ — identical rounding both engines
    // (exact under 2^53; round-to-nearest of the same integer above).
    Q("feature_scale",
      Some("""WITH m AS (
             |  SELECT c_custkey, c_mktsegment,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS v,
             |         count(*) OVER w AS n,
             |         sum(CAST(round(c_acctbal * 100) AS BIGINT)) OVER w AS s,
             |         sum(CAST(round(c_acctbal * 100) AS BIGINT)
             |             * CAST(round(c_acctbal * 100) AS BIGINT)) OVER w AS s2,
             |         min(CAST(round(c_acctbal * 100) AS BIGINT)) OVER w AS vmin,
             |         max(CAST(round(c_acctbal * 100) AS BIGINT)) OVER w AS vmax
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment))
             |SELECT c_custkey, c_mktsegment,
             |       CAST(round(CAST(v * n - s AS DOUBLE)
             |            / sqrt(CAST(CAST(n AS HUGEINT) * s2 - s * s
             |                        AS DOUBLE)) * 1e6) AS BIGINT) AS z_micro,
             |       CAST(round(CAST(v - vmin AS DOUBLE)
             |            / (vmax - vmin) * 1e6) AS BIGINT) AS mm_micro
             |FROM m ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
        val v = round(col("c_acctbal") * 100).cast("long")
        val dec = "decimal(38,0)"
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), v.as("v"))
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s", sum(col("v").cast(dec)).over(w))
          .withColumn("s2", sum(col("v").cast(dec) * col("v").cast(dec)).over(w))
          .withColumn("vmin", min(col("v")).over(w))
          .withColumn("vmax", max(col("v")).over(w))
          .select(col("c_custkey"), col("c_mktsegment"),
            round((col("v").cast(dec) * col("n").cast(dec) - col("s"))
              .cast("double") /
              sqrt((col("n").cast(dec) * col("s2") -
                col("s") * col("s")).cast("double"))
              * 1e6).cast("long").as("z_micro"),
            round((col("v") - col("vmin")).cast("double") /
              (col("vmax") - col("vmin")) * 1e6).cast("long").as("mm_micro"))
          .orderBy("c_custkey")
      }),

    // exact weighted average: Σ(price·qty)/Σqty from exact decimal
    // products — the order-independent form of a ratio aggregate.
    Q("agg_weighted_avg",
      Some("""SELECT l_returnflag,
             |       CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             |                              * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |            / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |            * 1e6) AS BIGINT) AS wavg_micro,
             |       count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(
              sum(col("l_extendedprice").cast("decimal(18,2)") *
                col("l_quantity").cast("decimal(18,2)")).cast("double") /
              sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              * 1e6).cast("long").as("wavg_micro"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      }),

    // Bernoulli sampling by hash threshold: keep ~20% of rows chosen by
    // the Knuth multiplicative hash of the key. Unlike rand()-based
    // sampling this is deterministic under retry/speculation AND
    // requires NO sort or window — a pure codegen'd filter, the only
    // sampling that's free at 100 TB (sample_stratified is the
    // per-group-exact-k counterpart).
    // the Knuth product computes in DECIMAL(38,0)/HUGEINT: in int64 it
    // wraps at key ≈ 3.47e9 (well inside a 100 TB keyspace), where
    // Spark's non-ANSI multiply goes silently negative and the
    // sign-preserving % then ADMITS every wrapped row (~3× the rate
    // over the high-key range) while DuckDB errors on the same input —
    // the pmod/width-cliff class again. Still a pure codegen'd filter;
    // results bit-identical below the wrap point.
    Q("sample_bernoulli",
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE (CAST(c_custkey AS HUGEINT) * 2654435761) % 4294967296 < 858993459
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        Tables.customer(s, d)
          .filter(expr("(CAST(c_custkey AS DECIMAL(38,0)) * 2654435761) % 4294967296")
            < lit(858993459L))
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      })
  )
}
