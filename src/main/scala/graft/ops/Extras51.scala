package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 wave-51 operators: the time-constrained funnel and rolling
  * window actives.
  */
object Extras51 {

  def queries: Seq[Q] = Seq(
    // time-constrained funnel: view → purchase WITHIN 48h (the funnel
    // every growth team actually ships — unconstrained conversion
    // overcounts). Per purchase, the most recent prior view comes from
    // the as-of union trick (one shuffle on user, no per-row probe);
    // the 48h gate is exact integer µs. Reports viewer base, gated
    // purchases, gated converters, and the µ-int conversion rate.
    Q("funnel_windowed",
      Some("""WITH a AS (
             |  SELECT p.user_id, p.event_id, epoch_us(p.ts) -
             |         (SELECT max(epoch_us(v.ts)) FROM events v
             |          WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |            AND v.ts <= p.ts) AS delay_us
             |  FROM events p WHERE p.event_type = 'purchase'),
             |vw AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_viewers
             |       FROM events WHERE event_type = 'view')
             |SELECT vw.n_viewers,
             |       CAST(count(*) FILTER (WHERE delay_us IS NOT NULL
             |            AND delay_us <= 172800000000) AS BIGINT) AS n_purch_48h,
             |       CAST(count(DISTINCT user_id) FILTER (WHERE delay_us IS NOT NULL
             |            AND delay_us <= 172800000000) AS BIGINT) AS n_users_48h,
             |       CAST(round(CAST(count(DISTINCT user_id) FILTER
             |              (WHERE delay_us IS NOT NULL AND delay_us <= 172800000000)
             |            AS DOUBLE) * 1e6 / nullif(vw.n_viewers, 0)) AS BIGINT) AS cvr_e6
             |FROM a CROSS JOIN vw GROUP BY vw.n_viewers""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val delays = Joins.asOfViews(ev, Seq("last_view_ts" -> false))
          .select(col("k").as("user_id"),
            (unix_micros(col("t")) - unix_micros(col("last_view_ts")))
              .as("delay_us"))
        val vw = ev.filter(col("event_type") === "view")
          .agg(countDistinct("user_id").cast("long").as("n_viewers"))
        val hit = col("delay_us").isNotNull &&
          col("delay_us") <= 172800000000L
        delays.crossJoin(broadcast(vw))
          .groupBy("n_viewers")
          .agg(count(when(hit, 1)).cast("long").as("n_purch_48h"),
            countDistinct(when(hit, col("user_id"))).cast("long")
              .as("n_users_48h"))
          .select(col("n_viewers"), col("n_purch_48h"), col("n_users_48h"),
            expr("CAST(round(CAST(n_users_48h AS DOUBLE) * 1e6" +
                " / nullif(n_viewers, 0)) AS BIGINT)")
              .as("cvr_e6"))
      }),

    // rolling 7-day active users per activity day (the WAU curve):
    // reduce to DISTINCT (user, day) first, then each active day
    // contributes the user to the 7 windows ending on d..d+6 — a
    // bounded 7× explode on the REDUCED activity set, never the event
    // log — and distinct-count per window end. Windows are reported
    // only for observed activity days. Scale: the explode and the
    // (day, user) distinct both partition on day; no per-user state,
    // no sliding-window shuffle per event.
    Q("analytics_rolling_wau",
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
             |           FROM events),
             |x AS (SELECT user_id, d + CAST(k AS INTEGER) AS wd
             |      FROM ud, LATERAL unnest(range(7)) u(k)),
             |days AS (SELECT DISTINCT CAST(ts AS DATE) AS wd FROM events)
             |SELECT x.wd AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |FROM x JOIN days USING (wd)
             |GROUP BY 1 ORDER BY day""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val ud = ev.select(col("user_id"), to_date(col("ts")).as("d"))
          .distinct()
        val x = ud.select(col("user_id"), col("d"),
          explode(sequence(lit(0), lit(6))).as("k"))
          .withColumn("wd", date_add(col("d"), col("k").cast("int")))
        val days = ev.select(to_date(col("ts")).as("wd")).distinct()
        x.join(days, "wd")
          .groupBy(col("wd").as("day"))
          .agg(countDistinct("user_id").cast("long").as("wau"))
          .orderBy("day")
      }),

    // sequence pattern matching (the MATCH_RECOGNIZE niche Spark
    // lacks): per user, count non-overlapping view→click*→purchase
    // journeys in the event-type sequence. Event initials are distinct
    // (c/e/p/s/v), so the per-user ordered initial stream IS the
    // sequence. The engine side detects 'vc*p' WITHOUT materializing
    // the sequence: every regex match contains exactly ONE 'p' (its
    // last char — 'v' and 'c*' cannot contain one), so matches never
    // share a 'p' and leftmost non-overlap is automatic; conversely a
    // 'p' ends a match iff scanning left over zero or more 'c's hits
    // a 'v' — i.e. iff its nearest PRECEDING non-'c' initial is 'v'.
    // That per-event predicate is a running last(non-'c') over the
    // user-ordered window — constant per-row state in a spill-backed
    // frame, the structural bound the old per-user collect_list-to-
    // string lacked (a power user no longer concatenates into one
    // aggregation buffer). One shuffle on user (window + the groupBy
    // reuse its partitioning); the oracle keeps DuckDB's string_agg +
    // regexp spelling of the same count.
    Q("seq_pattern_match",
      Some("""WITH s AS (SELECT user_id,
             |        string_agg(substr(event_type, 1, 1), ''
             |                   ORDER BY ts, event_id) AS seq
             |      FROM events GROUP BY 1)
             |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
             |       CAST(length(regexp_extract_all(seq, 'vc*p')) AS BIGINT)
             |         AS n_journeys
             |FROM s WHERE length(regexp_extract_all(seq, 'vc*p')) > 0
             |ORDER BY user_id""".stripMargin),
      (s, d) => journeyCounts(Tables.events(s, d))),

    // equi-height histogram statistics (what ANALYZE TABLE ... FOR
    // COLUMNS collects and a cost-based optimizer consumes): quartile
    // bin boundaries from exact percentile_disc on cents, then per-bin
    // row count, DISTINCT count, and min/max — broadcast thresholds +
    // map-side CASE, one aggregation, no sort of the fact (the
    // feature_quantile_bucket shape promoted to a stats report).
    // Consumed by `join_cost_advisor` below, which applies the same
    // histogram shape to a join key to estimate join cost per bin.
    Q("agg_histogram_equiheight",
      Some("""WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
             |           FROM lineitem),
             |q AS (SELECT CAST(quantile_disc(v, 0.25) AS BIGINT) AS q1,
             |             CAST(quantile_disc(v, 0.50) AS BIGINT) AS q2,
             |             CAST(quantile_disc(v, 0.75) AS BIGINT) AS q3
             |      FROM c),
             |b AS (SELECT CAST(CASE WHEN v <= q.q1 THEN 1 WHEN v <= q.q2 THEN 2
             |                  WHEN v <= q.q3 THEN 3 ELSE 4 END AS BIGINT) AS bin, v
             |      FROM c CROSS JOIN q)
             |SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(DISTINCT v) AS BIGINT) AS ndv,
             |       CAST(min(v) AS BIGINT) AS lo_cents,
             |       CAST(max(v) AS BIGINT) AS hi_cents
             |FROM b GROUP BY 1 ORDER BY bin""".stripMargin),
      (s, d) => {
        val c = Tables.lineitem(s, d)
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
        // exact quartiles via the distributed CDF + shared CASE ladder
        // (percentile_disc buffers the whole column per cutpoint —
        // 4.3s serial at sf0.1 and unbounded memory at scale; see
        // ScaleRank.exactQuantilesDisc).
        // r16 (guide §2.3): EVERY statistic here is a function of the
        // distinct (value, count) relation the quantile machinery
        // already reduces to — n_rows = Σcnt, ndv = row count, lo/hi =
        // min/max over distinct values — so the histogram aggregates
        // THAT table instead of re-scanning the fact for binning and
        // paying countDistinct's expand (two extra fact-sized
        // shuffles). One localCheckpoint makes the reduction the one
        // fact pass both the cuts and the report read: 4.4 → 2.5 s
        // serial at sf0.1, hash unchanged.
        val vc = c.groupBy("v").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(false)
        val cuts = ScaleRank.exactQuantilesDiscCounted(vc, "v", "cnt",
          (1 until 4).map(_ -> 4), (1 until 4).map(i => s"q$i"))
        ScaleRank.binByCuts(vc, "v", 4, "bin", cuts)
          .groupBy("bin")
          .agg(sum("cnt").cast("long").as("n_rows"),
            count(lit(1)).cast("long").as("ndv"),
            min("v").cast("long").as("lo_cents"),
            max("v").cast("long").as("hi_cents"))
          .orderBy("bin")
      }),

    // the histogram's CONSUMER: a join-side cost advisor for the
    // orders ⋈ customer join that `join_hinted` force-hints. The
    // equi-height histogram of the JOIN KEY (quartile bins of
    // o_custkey) gives per-bin fact rows + NDV; the dim side is
    // counted into the SAME broadcast bin boundaries; the report is
    // what a cost-based planner reads off such histograms — per-key
    // fanout, estimated join output rows per bin (n_fact·n_dim/ndv_dim)
    // and the broadcast-vs-shuffle_hash side recommendation from the
    // dim total. Scale: two scans with map-side CASE binning (the
    // thresholds broadcast), two partial+final aggregations to 4 rows
    // each, then 4-row joins — the whole point is estimating the big
    // join WITHOUT running it.
    Q("join_cost_advisor",
      Some("""WITH f AS (SELECT o_custkey AS k FROM orders),
             |q AS (SELECT CAST(quantile_disc(k, 0.25) AS BIGINT) AS q1,
             |             CAST(quantile_disc(k, 0.50) AS BIGINT) AS q2,
             |             CAST(quantile_disc(k, 0.75) AS BIGINT) AS q3
             |      FROM f),
             |fb AS (SELECT CAST(CASE WHEN k <= q.q1 THEN 1 WHEN k <= q.q2 THEN 2
             |                   WHEN k <= q.q3 THEN 3 ELSE 4 END AS BIGINT) AS bin, k
             |       FROM f CROSS JOIN q),
             |fs AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_fact,
             |              CAST(count(DISTINCT k) AS BIGINT) AS ndv_fact
             |       FROM fb GROUP BY 1),
             |db AS (SELECT CAST(CASE WHEN c_custkey <= q.q1 THEN 1
             |                   WHEN c_custkey <= q.q2 THEN 2
             |                   WHEN c_custkey <= q.q3 THEN 3 ELSE 4 END AS BIGINT) AS bin,
             |              c_custkey AS k
             |       FROM customer CROSS JOIN q),
             |ds AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_dim,
             |              CAST(count(DISTINCT k) AS BIGINT) AS ndv_dim
             |       FROM db GROUP BY 1),
             |t AS (SELECT CAST(sum(n_dim) AS BIGINT) AS dim_total FROM ds)
             |SELECT fs.bin, n_fact, ndv_fact, n_dim, ndv_dim,
             |       CAST(round(CAST(n_fact AS DOUBLE) * 100 / ndv_fact) AS BIGINT) AS fanout_e2,
             |       CAST(round(CAST(n_fact AS DOUBLE) * n_dim / ndv_dim) AS BIGINT) AS est_out_rows,
             |       CASE WHEN dim_total <= 1000000 THEN 'broadcast'
             |            ELSE 'shuffle_hash' END AS side_hint
             |FROM fs JOIN ds ON fs.bin = ds.bin CROSS JOIN t
             |ORDER BY fs.bin""".stripMargin),
      (s, d) => {
        val f = Tables.orders(s, d).select(col("o_custkey").as("k"))
        // cuts computed ONCE from the fact side; both frames bin
        // against the same boundaries (that's the histogram contract)
        val q = ScaleRank.quantileCuts(f, "k", 4)
        def binned(df: org.apache.spark.sql.DataFrame) =
          ScaleRank.binByCuts(df, "k", 4, "bin", q)
        val fs = binned(f).groupBy("bin")
          .agg(count(lit(1)).cast("long").as("n_fact"),
            countDistinct("k").cast("long").as("ndv_fact"))
        val ds = binned(Tables.customer(s, d).select(col("c_custkey").as("k")))
          .groupBy("bin")
          .agg(count(lit(1)).cast("long").as("n_dim"),
            countDistinct("k").cast("long").as("ndv_dim"))
        val t = ds.agg(sum("n_dim").cast("long").as("dim_total"))
        fs.join(broadcast(ds), "bin").crossJoin(broadcast(t))
          .select(col("bin"), col("n_fact"), col("ndv_fact"),
            col("n_dim"), col("ndv_dim"),
            expr("CAST(round(CAST(n_fact AS DOUBLE) * 100 / ndv_fact) AS BIGINT)")
              .as("fanout_e2"),
            expr("CAST(round(CAST(n_fact AS DOUBLE) * n_dim / ndv_dim) AS BIGINT)")
              .as("est_out_rows"),
            when(col("dim_total") <= 1000000L, "broadcast")
              .otherwise("shuffle_hash").as("side_hint"))
          .orderBy("bin")
      }))

  /** The 'vc*p' journey counter over an events-shaped frame (user_id,
    * ts, event_id, event_type) — the running-state spelling of
    * `regexp_count(ordered initials, 'vc*p')` (proof in the
    * seq_pattern_match registration comment above; pinned on
    * constructed sequences in Extras51Spec). */
  def journeyCounts(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // asc_nulls_last: DuckDB's string_agg ORDER BY puts NULLs last,
    // Spark's asc default puts them first — a null ts/event_id would
    // reorder the automaton's input across engines (none in testdata;
    // the pin is for corpora that have them)
    val prev = Window.partitionBy("user_id")
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    // nullif(…, ''): an EMPTY-string event_type contributes zero
    // characters to the oracle's string_agg sequence (substr('',1,1)
    // = ''), so it must be transparent to the automaton exactly like
    // NULL — without the nullif, '' is non-null in Spark: it would
    // reset last_nc (breaking a v..p journey across it) and count in
    // n_events, where the regex side never saw a character at all
    ev.select(col("user_id"), col("ts"), col("event_id"),
        nullif(substring(col("event_type"), 1, 1), lit("")).as("i"))
      .withColumn("last_nc",
        last(when(col("i") =!= "c", col("i")), ignoreNulls = true)
          .over(prev))
      .groupBy("user_id")
      // count(i), not count(*): a null event_type never reaches the
      // oracle's string_agg sequence, so it must not count here either
      // (it is also transparent to the automaton — the ignoreNulls
      // last() skips it, exactly as it is absent from the regex string)
      .agg(count(col("i")).cast("long").as("n_events"),
        sum(when(col("i") === "p" && col("last_nc") === "v", 1L)
          .otherwise(0L)).cast("long").as("n_journeys"))
      .filter(col("n_journeys") > 0)
      .orderBy("user_id")
  }
}
