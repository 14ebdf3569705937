package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-3 operators: financial-style OHLC resampling, exact
  * rolling variance, Pareto (80/20) concentration, one-hot encoding,
  * threshold-based quantile bucketing, inline VALUES tables, and URL
  * canonicalization dedup. All oracled; floats leave through the
  * µ-scaled/cents-integer door (SCALE.md policy).
  */
object Extras6 {

  /** The previous sql_ctas generation created by THIS JVM (unique
    * UUID name — no other process ever references it), dropped once a
    * newer generation exists. */
  @volatile private var lastCtasTable: Option[String] = None

  /** Shared-text SQL (oracle AND engine parse the same bytes; see the
    * identical-IEEE-ops policy in SCALE.md). */
  private val HaversineSql =
    """SELECT c_custkey,
      |  CAST(round(2 * 6371000.0 * asin(sqrt(
      |    sin(radians((48.8566 - (c_custkey % 180 - 89.5)) / 2)) *
      |    sin(radians((48.8566 - (c_custkey % 180 - 89.5)) / 2)) +
      |    cos(radians(c_custkey % 180 - 89.5)) * cos(radians(48.8566)) *
      |    sin(radians((2.3522 - (c_custkey * 7 % 360 - 179.5)) / 2)) *
      |    sin(radians((2.3522 - (c_custkey * 7 % 360 - 179.5)) / 2))
      |  ))) AS BIGINT) AS dist_m
      |FROM customer ORDER BY c_custkey""".stripMargin

  private val SkewKurtosisSql =
    """WITH p AS (SELECT event_type,
      |        CAST(count(*) AS DOUBLE) AS n,
      |        CAST(sum(x) AS DOUBLE) AS s1, CAST(sum(x*x) AS DOUBLE) AS s2,
      |        CAST(sum(x*x*x) AS DOUBLE) AS s3, CAST(sum(x*x*x*x) AS DOUBLE) AS s4
      |      FROM (SELECT event_type,
      |              CAST(round(value * 10) AS DECIMAL(38,0)) AS x FROM events) t
      |      GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_events,
      |  CAST(round(((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
      |    / pow(s2/n - (s1/n)*(s1/n), 1.5)) * 1e6) AS BIGINT) AS skew6,
      |  CAST(round(((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
      |      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
      |    / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3) * 1e6) AS BIGINT) AS kurt6
      |FROM p ORDER BY event_type""".stripMargin

  def queries: Seq[Q] = Seq(
    // OHLC resample: per (user, day) the open/high/low/close of the
    // event value stream. ONE aggregation pass: open/close are
    // lexicographic min/max over struct(ts, event_id, v6) — no window,
    // no self-join, no per-day re-scan. The oracle spells the same
    // argmin/argmax with row_number windows. event_id breaks ts ties
    // deterministically. (reference etl_core.py:33-41 computes only
    // whole-frame describe(); per-bucket OHLC is the streaming-grade
    // generalization.)
    Q("ts_ohlc",
      Some("""WITH e AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |                  ts, event_id, CAST(round(value * 1e6) AS BIGINT) AS v6
             |           FROM events),
             |r AS (SELECT *,
             |        row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rn_a,
             |        row_number() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn_z,
             |        count(*) OVER (PARTITION BY user_id, day) AS n_events,
             |        max(v6) OVER (PARTITION BY user_id, day) AS high6,
             |        min(v6) OVER (PARTITION BY user_id, day) AS low6
             |      FROM e)
             |SELECT a.user_id, a.day, a.v6 AS open6, z.v6 AS close6,
             |       a.high6, a.low6, a.n_events
             |FROM r a JOIN r z ON a.user_id = z.user_id AND a.day = z.day AND z.rn_z = 1
             |WHERE a.rn_a = 1 ORDER BY a.user_id, a.day""".stripMargin),
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("user_id"), date_trunc("day", col("ts")).as("day"),
          col("ts"), col("event_id"),
          round(col("value") * lit(1e6)).cast("long").as("v6"))
        e.groupBy("user_id", "day")
          .agg(min(struct(col("ts"), col("event_id"), col("v6"))).as("o"),
            max(struct(col("ts"), col("event_id"), col("v6"))).as("c"),
            max(col("v6")).as("high6"), min(col("v6")).as("low6"),
            count(lit(1)).as("n_events"))
          .select(col("user_id"), col("day"), col("o.v6").as("open6"),
            col("c.v6").as("close6"), col("high6"), col("low6"), col("n_events"))
          .orderBy("user_id", "day")
      }),

    // exact rolling variance: trailing 24-row frame per user, variance
    // numerator n·Σx² − (Σx)² in cents² — pure BIGINT (cents ≤ 5.7e4,
    // so n·Σx² ≤ ~1.9e12), associative, hash-stable in any engine. One
    // shuffle on user_id; all three window aggregates share one sort.
    // Trailing frame only — a (currentRow, unboundedFollowing) frame
    // re-scans the partition per row (O(n·partition), the round-4
    // ts_interp_linear lesson).
    Q("window_rolling_var",
      Some("""WITH e AS (SELECT event_id, user_id, ts,
             |                  CAST(round(value * 100) AS BIGINT) AS cents
             |           FROM events),
             |w AS (SELECT event_id,
             |        CAST(count(*) OVER f AS BIGINT) AS n,
             |        CAST(sum(cents) OVER f AS BIGINT) AS s1,
             |        CAST(sum(cents * cents) OVER f AS BIGINT) AS s2
             |      FROM e
             |      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
             |SELECT event_id, n, n * s2 - s1 * s1 AS var_num_cents2
             |FROM w ORDER BY event_id""".stripMargin),
      (s, d) => {
        val f = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-23, Window.currentRow)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value") * 100).cast("long").as("cents"))
          .select(col("event_id"),
            count(lit(1)).over(f).as("n"),
            sum(col("cents")).over(f).as("s1"),
            sum(col("cents") * col("cents")).over(f).as("s2"))
          .select(col("event_id"), col("n"),
            (col("n") * col("s2") - col("s1") * col("s1")).as("var_num_cents2"))
          .orderBy("event_id")
      }),

    // Pareto / 80-20 concentration: how many top customers carry 80% of
    // revenue. Boundary in exact integers (5·running ≥ 4·total — no
    // float share), revenue in cents. Rank AND running sum come from
    // ScaleRank.withGlobalRank (range-bucketed two-phase, descending)
    // — exact global row_number/prefix-sum with no single-partition
    // sort, so the plan holds at 10⁹ customers. Result is a 1-row
    // summary.
    Q("analytics_pareto",
      Some("""WITH r AS (SELECT o_custkey,
             |            sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |          FROM orders GROUP BY 1),
             |k AS (SELECT cents,
             |        row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
             |        CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
             |      FROM r),
             |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total, count(*) AS n_cust FROM k)
             |SELECT CAST(min(k.rk) AS BIGINT) AS n_top80, t.n_cust, t.total AS total_cents
             |FROM k, t WHERE 5 * k.run >= 4 * t.total
             |GROUP BY t.n_cust, t.total""".stripMargin),
      (s, d) => {
        val r = Tables.orders(s, d).groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        val k = ScaleRank.withGlobalRank(r, "cents", "o_custkey",
          descending = true, runOn = Some("cents"))
        // totals from the CHEAP pre-rank aggregate: ranking never
        // changes sum/count, and aggregating k instead would execute
        // the whole ScaleRank plan (range join + windows) a second time
        val t = r.agg(sum(col("cents")).as("total"), count(lit(1)).as("n_cust"))
        k.crossJoin(broadcast(t))
          .filter(col("run") * 5 >= col("total") * 4)
          .groupBy("n_cust", "total")
          .agg(min(col("rk")).cast("long").as("n_top80"))
          .select(col("n_top80"), col("n_cust"), col("total").as("total_cents"))
      }),

    // one-hot encoding of a categorical (the feature-engineering
    // primitive; TPC-H's five market segments). Pure map-side CASE
    // projection — no shuffle, no pivot, codegen'd; the column set is
    // fixed by the dictionary, so the schema is static at any scale.
    Q("feature_onehot",
      Some("""SELECT c_custkey,
             |  CAST(c_mktsegment = 'AUTOMOBILE' AS BIGINT) AS seg_automobile,
             |  CAST(c_mktsegment = 'BUILDING'   AS BIGINT) AS seg_building,
             |  CAST(c_mktsegment = 'FURNITURE'  AS BIGINT) AS seg_furniture,
             |  CAST(c_mktsegment = 'HOUSEHOLD'  AS BIGINT) AS seg_household,
             |  CAST(c_mktsegment = 'MACHINERY'  AS BIGINT) AS seg_machinery
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val oneHots = segs.map(g =>
          (col("c_mktsegment") === g).cast("long").as(s"seg_${g.toLowerCase}"))
        Tables.customer(s, d)
          .select(col("c_custkey") +: oneHots: _*)
          .orderBy("c_custkey")
      }),

    // quantile bucketing by THRESHOLD, not ntile: exact quartile cut
    // points computed once on the aggregate (percentile_disc picks
    // actual data values — no interpolation float), then every row is
    // assigned map-side by comparison against the broadcast thresholds.
    // Unlike agg_deciles' ntile (a global sort of all rows), this is
    // the 100 TB spelling: O(1) boundary rows cross the cluster, the
    // fact table never re-sorts. Bucket populations are NOT forced
    // equal when values tie at a cut — the semantic difference vs
    // ntile, and the reproducible one (ties land by value, not by
    // partition order).
    Q("feature_quantile_bucket",
      Some("""WITH c AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |           FROM orders),
             |q AS (SELECT
             |        CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1,
             |        CAST(quantile_disc(cents, 0.50) AS BIGINT) AS q2,
             |        CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3
             |      FROM c),
             |b AS (SELECT CASE WHEN cents <= q.q1 THEN 1 WHEN cents <= q.q2 THEN 2
             |                  WHEN cents <= q.q3 THEN 3 ELSE 4 END AS bucket, cents
             |      FROM c, q)
             |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n,
             |       CAST(min(cents) AS BIGINT) AS lo_cents,
             |       CAST(max(cents) AS BIGINT) AS hi_cents
             |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin),
      (s, d) => {
        val c = Tables.orders(s, d)
          .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
        // distributed exact quartiles + shared CASE ladder —
        // percentile_disc's whole-column aggregate buffer is the
        // non-scalable spelling (ScaleRank.exactQuantilesDisc doc).
        // r16 (guide §2.3): every output statistic (n = Σcnt, lo/hi =
        // min/max) is a function of the distinct (cents, count)
        // relation the cuts machinery reduces to anyway, so bin THAT
        // table instead of re-scanning the fact — the
        // agg_histogram_equiheight shape (Extras51), applied here.
        val vc = c.groupBy("cents").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false)
        val cuts = ScaleRank.exactQuantilesDiscCounted(vc, "cents", "cnt",
          (1 until 4).map(_ -> 4), (1 until 4).map(i => s"q$i"))
        ScaleRank.binByCuts(vc, "cents", 4, "bucket", cuts)
          .groupBy("bucket")
          .agg(sum("cnt").as("n"), min(col("cents")).as("lo_cents"),
            max(col("cents")).as("hi_cents"))
          .orderBy("bucket")
      }),

    // inline VALUES table — literal rows as a first-class relation
    // (lookup/dictionary joins without a file or a temp view). The
    // 3-row side is a constant LocalRelation: Catalyst folds it and
    // broadcast-joins; nothing shuffles at any scale.
    Q("sql_values_inline",
      Some("""SELECT CAST(t.k AS BIGINT) AS k, t.zone, n.n_name
             |FROM (VALUES (0, 'AMER'), (1, 'AMER'), (2, 'APAC'))
             |       t(k, zone)
             |JOIN nation n ON n.n_regionkey = t.k
             |ORDER BY k, n_name""".stripMargin),
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("nation_vi")
        s.sql("""SELECT CAST(t.k AS BIGINT) AS k, t.zone, n.n_name
                |FROM VALUES (0, 'AMER'), (1, 'AMER'), (2, 'APAC')
                |       AS t(k, zone)
                |JOIN nation_vi n ON n.n_regionkey = t.k
                |ORDER BY k, n_name""".stripMargin)
      }),

    // haversine great-circle distance (geospatial-lite; coordinates
    // synthesized from keys, the distance kernel is the operator).
    // Pure map-side IEEE math — radians/sin/cos/asin/sqrt are the same
    // libm-grade ops in any engine, and the metre rounding absorbs the
    // ≤1-ulp trig divergence by ~7 orders of magnitude. No shuffle.
    Q("geo_haversine",
      Some(HaversineSql),
      // ONE formula string for both engines (registerViews names the
      // Spark temp view `customer`, same as the DuckDB table) — the
      // identical-text contract IS the bit-exactness argument, so it
      // must not live in two copies that can drift
      (s, d) => {
        SqlSurface.registerViews(s, d, "customer")
        s.sql(HaversineSql)
      }),

    // CREATE TABLE AS SELECT — a managed parquet table in the session
    // catalog (DDL surface beyond views: the lakehouse "publish"
    // step). The table write is a normal distributed parquet job; the
    // catalog entry is metadata-only, so this scales like any sink.
    Q("sql_ctas",
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |ORDER BY n_nationkey""".stripMargin),
      (s, d) => {
        // create-only generation naming, no shared fixed table: the old
        // fixed `graft_ctas` DELETE of the warehouse location raced a
        // concurrent JVM sharing the same warehouse dir (each JVM's
        // in-memory catalog is blind to the other's table, so the
        // guard-delete always fired — under a running scan). A unique
        // name per invocation shares nothing; THIS JVM's previous
        // generation (no longer readable by anyone else by
        // construction) is dropped after the new one exists.
        Tables.nation(s, d).createOrReplaceTempView("nation_ctas_src")
        val tbl = s"graft_ctas_g${java.util.UUID.randomUUID.toString.replace("-", "")}"
        s.sql(s"""CREATE TABLE $tbl USING PARQUET AS
                 |SELECT n_nationkey, n_name, n_regionkey FROM nation_ctas_src""".stripMargin)
        Extras6.synchronized {
          lastCtasTable.foreach(prev =>
            try s.sql(s"DROP TABLE IF EXISTS $prev")
            catch { case scala.util.control.NonFatal(_) => () })
          lastCtasTable = Some(tbl)
        }
        s.table(tbl).orderBy("n_nationkey")
      }),

    // data-freshness monitor: per feed (event_type) the high-water
    // mark, its lag behind the global high-water mark, and trailing-day
    // volume — all in exact microseconds (unix_micros ↔ epoch_us), no
    // float epoch. Two tiny aggregates; the global max broadcasts.
    Q("dq_freshness",
      Some("""WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
             |f AS (SELECT event_type, max(epoch_us(ts)) AS max_us, count(*) AS n_total
             |      FROM events GROUP BY 1),
             |d AS (SELECT e.event_type, count(*) AS n_last_day
             |      FROM events e, g
             |      WHERE epoch_us(e.ts) >= g.gmax - 86400000000 GROUP BY 1)
             |SELECT f.event_type, f.max_us, g.gmax - f.max_us AS lag_us,
             |       f.n_total, CAST(coalesce(d.n_last_day, 0) AS BIGINT) AS n_last_day
             |FROM f LEFT JOIN d ON f.event_type = d.event_type, g
             |ORDER BY f.event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"),
          unix_micros(col("ts")).as("us"))
        val g = ev.agg(max(col("us")).as("gmax"))
        val f = ev.groupBy("event_type")
          .agg(max(col("us")).as("max_us"), count(lit(1)).as("n_total"))
        val dd = ev.crossJoin(broadcast(g))
          .filter(col("us") >= col("gmax") - lit(86400000000L))
          .groupBy("event_type").agg(count(lit(1)).as("n_last_day"))
        // LEFT join + coalesce(0): a feed silent for >24h has no
        // trailing-day row, and an inner join would drop it from the
        // report — the exact stale feed a freshness monitor exists to
        // surface (lag_us large, n_last_day 0)
        f.join(dd, Seq("event_type"), "left").crossJoin(broadcast(g))
          .select(col("event_type"), col("max_us"),
            (col("gmax") - col("max_us")).as("lag_us"),
            col("n_total"),
            coalesce(col("n_last_day"), lit(0L)).as("n_last_day"))
          .orderBy("event_type")
      }),

    // exact-moment skewness + kurtosis: power sums Σx..Σx⁴ accumulate
    // as DECIMAL(38,0) over the deci-scaled value (exact, associative —
    // hash-stable on 1000 executors), then ONE cast to double and a
    // closed-form population formula whose TEXT is identical in both
    // engines (identical IEEE ops → identical bits; SCALE.md policy).
    // Spark's skewness()/kurtosis() built-ins are the non-oracle path:
    // DuckDB's are sample-corrected, Spark's population — the explicit
    // formula sidesteps the convention mismatch.
    Q("agg_skew_kurtosis",
      Some(SkewKurtosisSql),
      // same single-copy contract as HaversineSql: the closed-form
      // moment formula's TEXT must be identical in both engines
      (s, d) => {
        SqlSurface.registerViews(s, d, "events")
        s.sql(SkewKurtosisSql)
      }),

    // repetition quality signals (the Gopher-style pretraining filters):
    // per doc the duplicate-word ratio, top-word share, Simpson
    // concentration index Σc²/n², and the longest consecutive-token
    // run (gaps-and-islands over token positions). All ratios are
    // exact µ-scaled integer divisions — no float. Tokens shuffle once
    // on doc_id (the explode is map-side); both window passes and the
    // run-length aggregation share that partitioning.
    Q("text_repetition_score",
      Some("""WITH t AS (SELECT doc_id,
             |        generate_subscripts(string_split(text, ' '), 1) AS pos,
             |        unnest(string_split(text, ' ')) AS w FROM documents),
             |r AS (SELECT doc_id, pos, w,
             |        CASE WHEN lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
             |             IS DISTINCT FROM w THEN 1 ELSE 0 END AS brk FROM t),
             |g AS (SELECT doc_id, w, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id FROM r),
             |runs AS (SELECT doc_id, run_id, count(*) AS rl FROM g GROUP BY 1, 2),
             |mr AS (SELECT doc_id, max(rl) AS max_run FROM runs GROUP BY 1),
             |wc AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
             |agg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS mx,
             |               sum(c * c) AS s2 FROM wc GROUP BY 1)
             |SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_words,
             |       CAST(a.nd AS BIGINT) AS n_distinct,
             |       CAST((a.n - a.nd) * 1000000 // a.n AS BIGINT) AS dup6,
             |       CAST(a.mx * 1000000 // a.n AS BIGINT) AS top6,
             |       CAST(a.s2 * 1000000 // (a.n * a.n) AS BIGINT) AS simpson6,
             |       CAST(mr.max_run AS BIGINT) AS max_run
             |FROM agg a JOIN mr ON a.doc_id = mr.doc_id
             |ORDER BY a.doc_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, d).select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val wOrd = Window.partitionBy("doc_id").orderBy("pos")
        val runs = t
          .withColumn("brk",
            when(!(lag(col("w"), 1).over(wOrd) <=> col("w")), 1L).otherwise(0L))
          .withColumn("run_id", sum(col("brk")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("doc_id", "run_id").agg(count(lit(1)).as("rl"))
          .groupBy("doc_id").agg(max(col("rl")).as("max_run"))
        val agg = t.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(sum(col("c")).as("n"),
            count(lit(1)).as("nd"), max(col("c")).as("mx"),
            sum(col("c") * col("c")).as("s2"))
        agg.join(runs, "doc_id")
          .select(col("doc_id"), col("n").as("n_words"), col("nd").as("n_distinct"),
            expr("((n - nd) * 1000000) div n").as("dup6"),
            expr("(mx * 1000000) div n").as("top6"),
            expr("(s2 * 1000000) div (n * n)").as("simpson6"),
            col("max_run"))
          .orderBy("doc_id")
      }),

    // deterministic corpus-mix sampling: hit a 50/30/20 target blend
    // across source pools with hash-ranked per-pool quotas (quota =
    // share of the TOTAL corpus → scale-invariant). The rank hash is
    // the same Knuth multiplicative scheme as sample_stratified —
    // stable under task retry, no RNG state. One shuffle on pool.
    Q("corpus_mix_sample",
      Some("""WITH p AS (SELECT doc_id,
             |        CAST(substr(source, 4) AS INT) % 3 AS pool FROM documents),
             |t AS (SELECT count(*) AS total FROM p),
             |r AS (SELECT doc_id, pool,
             |        CASE pool WHEN 0 THEN 50 WHEN 1 THEN 30 ELSE 20 END AS w,
             |        row_number() OVER (PARTITION BY pool
             |          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
             |      FROM p)
             |SELECT r.doc_id, CAST(r.pool AS BIGINT) AS pool, CAST(r.rn AS BIGINT) AS rn
             |FROM r, t WHERE r.rn <= r.w * t.total // 100
             |ORDER BY pool, rn""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val p = Tables.documents(s, d).select(col("doc_id"),
          (substring(col("source"), 4, 10).cast("int") % 3).as("pool"))
        val t = p.agg(count(lit(1)).as("total"))
        val r = p
          .withColumn("w", expr("CASE pool WHEN 0 THEN 50 WHEN 1 THEN 30 ELSE 20 END"))
          .withColumn("rn", row_number().over(Window.partitionBy("pool")
            .orderBy((col("doc_id") * lit(2654435761L)) % lit(4294967296L), col("doc_id"))))
        r.crossJoin(broadcast(t))
          .filter(col("rn") <= expr("(w * total) div 100"))
          .select(col("doc_id"), col("pool").cast("long").as("pool"),
            col("rn").cast("long").as("rn"))
          .orderBy("pool", "rn")
      }),

    // URL canonicalization dedup — the web-crawl dedup primitive: strip
    // the query string, lowercase scheme+host+path, trim the trailing
    // slash, keep the earliest doc per canonical URL. (URLs synthesized
    // deterministically from doc_id/source; the canonicalize+dedup
    // plumbing is the operator under test.) One shuffle on the
    // canonical key; the regex is map-side.
    Q("dedup_url",
      Some("""WITH u AS (SELECT doc_id,
             |    'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) ||
             |    '.COM/' || source || '/p' || CAST(doc_id % 40 AS VARCHAR) ||
             |    '/?utm_source=feed&ref=' || CAST(doc_id AS VARCHAR) AS url
             |  FROM documents),
             |c AS (SELECT doc_id,
             |        rtrim(lower(regexp_replace(url, '\?.*$', '')), '/') AS canonical
             |      FROM u)
             |SELECT canonical, min(doc_id) AS keeper, count(*) AS n_dups
             |FROM c GROUP BY 1 ORDER BY canonical""".stripMargin),
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 7).cast("string"),
              lit(".COM/"), col("source"), lit("/p"), (col("doc_id") % 40).cast("string"),
              lit("/?utm_source=feed&ref="), col("doc_id").cast("string")).as("url"))
          .select(col("doc_id"),
            rtrim(lower(regexp_replace(col("url"), "\\?.*$", "")), "/").as("canonical"))
          .groupBy("canonical")
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
          .orderBy("canonical")
      })
  )
}
