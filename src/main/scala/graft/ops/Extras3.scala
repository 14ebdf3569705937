package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 operators: SCD-2 interval building (CDC history), single-pass
  * data profiling, PII masking, deterministic stratified sampling, and
  * small-file compaction — the warehouse-maintenance surface around the
  * core query engine.
  */
object Extras3 {

  def queries: Seq[Q] = Seq(
    // SCD Type-2 dimension build from the event log: per user, one row
    // per consecutive run of the same event_type, with validity
    // interval [valid_from, valid_to) and NULL valid_to = current.
    Q("scd2_intervals",
      Some("""WITH c AS (
             |  SELECT user_id, event_type, ts, event_id,
             |         CASE WHEN lag(event_type) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id)
             |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
             |  FROM events),
             |v AS (
             |  SELECT user_id, event_type, ts,
             |         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS version
             |  FROM c),
             |g AS (
             |  SELECT user_id, version, min(event_type) AS event_type,
             |         min(ts) AS valid_from, count(*) AS n_events
             |  FROM v GROUP BY user_id, version)
             |SELECT user_id, CAST(version AS BIGINT) AS version, event_type, valid_from,
             |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             |         AS valid_to,
             |       n_events
             |FROM g ORDER BY user_id, version""".stripMargin),
      (s, d) => Scd.buildScd2(Tables.events(s, d),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumnRenamed("key", "user_id")
        .withColumnRenamed("attr", "event_type")
        .orderBy("user_id", "version")),

    // single-pass column profiling (the data-quality sweep a pipeline
    // runs before training): null counts, exact distinct counts, and
    // min/max per column, computed in ONE aggregation and unpivoted
    // with stack. Exact multi-column distinct plans as one Expand pass
    // (rows × 5) — at 100 TB swap count_distinct for
    // approx_count_distinct and the Expand disappears; the shape here
    // keeps the oracle exact. Numerics are micro-scaled to cents so the
    // cross-engine hash compares integers.
    Q("dq_profile",
      Some("""SELECT 'c_acctbal' AS col_name, count(*) AS n_rows,
             |       count(*) - count(c_acctbal) AS n_nulls,
             |       count(DISTINCT c_acctbal) AS n_distinct,
             |       CAST(round(min(c_acctbal)*100) AS BIGINT) AS min_num,
             |       CAST(round(max(c_acctbal)*100) AS BIGINT) AS max_num,
             |       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |FROM customer
             |UNION ALL
             |SELECT 'c_custkey', count(*), count(*) - count(c_custkey),
             |       count(DISTINCT c_custkey), min(c_custkey), max(c_custkey),
             |       NULL, NULL FROM customer
             |UNION ALL
             |SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
             |       count(DISTINCT c_mktsegment), NULL, NULL,
             |       min(c_mktsegment), max(c_mktsegment) FROM customer
             |UNION ALL
             |SELECT 'c_name', count(*), count(*) - count(c_name),
             |       count(DISTINCT c_name), NULL, NULL,
             |       min(c_name), max(c_name) FROM customer
             |UNION ALL
             |SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
             |       count(DISTINCT c_nationkey), min(c_nationkey), max(c_nationkey),
             |       NULL, NULL FROM customer
             |ORDER BY col_name""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d)
        val agg = c.agg(
          count(lit(1)).as("n"),
          count(col("c_custkey")).as("nn_key"),
          count_distinct(col("c_custkey")).as("nd_key"),
          min(col("c_custkey")).as("min_key"),
          max(col("c_custkey")).as("max_key"),
          count(col("c_nationkey")).as("nn_nat"),
          count_distinct(col("c_nationkey")).as("nd_nat"),
          min(col("c_nationkey")).cast("long").as("min_nat"),
          max(col("c_nationkey")).cast("long").as("max_nat"),
          count(col("c_acctbal")).as("nn_bal"),
          count_distinct(col("c_acctbal")).as("nd_bal"),
          expr("CAST(round(min(c_acctbal)*100) AS BIGINT)").as("min_bal"),
          expr("CAST(round(max(c_acctbal)*100) AS BIGINT)").as("max_bal"),
          count(col("c_name")).as("nn_name"),
          count_distinct(col("c_name")).as("nd_name"),
          min(col("c_name")).as("min_name"),
          max(col("c_name")).as("max_name"),
          count(col("c_mktsegment")).as("nn_seg"),
          count_distinct(col("c_mktsegment")).as("nd_seg"),
          min(col("c_mktsegment")).as("min_seg"),
          max(col("c_mktsegment")).as("max_seg"))
        agg.select(expr(
          """stack(5,
            |  'c_acctbal',   n - nn_bal,  nd_bal,  min_bal, max_bal,
            |      CAST(NULL AS STRING), CAST(NULL AS STRING),
            |  'c_custkey',   n - nn_key,  nd_key,  min_key, max_key,
            |      CAST(NULL AS STRING), CAST(NULL AS STRING),
            |  'c_mktsegment', n - nn_seg, nd_seg,  CAST(NULL AS BIGINT),
            |      CAST(NULL AS BIGINT), min_seg, max_seg,
            |  'c_name',      n - nn_name, nd_name, CAST(NULL AS BIGINT),
            |      CAST(NULL AS BIGINT), min_name, max_name,
            |  'c_nationkey', n - nn_nat,  nd_nat,  min_nat, max_nat,
            |      CAST(NULL AS STRING), CAST(NULL AS STRING))
            |  AS (col_name, n_nulls, n_distinct, min_num, max_num,
            |      min_str, max_str)""".stripMargin),
          col("n").as("n_rows"))
          .select("col_name", "n_rows", "n_nulls", "n_distinct",
            "min_num", "max_num", "min_str", "max_str")
          .orderBy("col_name")
      }),

    // PII masking (the redaction pass before a corpus leaves the
    // boundary): digits starred out, a stable join token (md5) kept for
    // linkage, the numeric balance generalized to a coarse band.
    Q("pipeline_pii_mask",
      Some("""SELECT c_custkey,
             |       regexp_replace(c_name, '[0-9]', '*', 'g') AS name_masked,
             |       md5(c_name) AS name_token,
             |       CASE WHEN c_acctbal < 0 THEN 'negative'
             |            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("name_masked"),
        md5(col("c_name")).as("name_token"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_band"))
        .orderBy("c_custkey")),

    // deterministic stratified sampling: fixed-size per-stratum sample
    // selected by a Knuth-hash order, reproducible across engines and
    // runs (a training-data pipeline samples per source/language with
    // exactly this shape). One shuffle on the stratum key; rank + filter
    // push the per-stratum limit into the window operator.
    Q("sample_stratified",
      Some("""SELECT c_custkey, c_mktsegment, rn FROM (
             |  SELECT c_custkey, c_mktsegment,
             |         CAST(row_number() OVER (PARTITION BY c_mktsegment
             |              ORDER BY (c_custkey * 2654435761) % 4294967296, c_custkey)
             |           AS BIGINT) AS rn
             |  FROM customer) t
             |WHERE rn <= 50 ORDER BY c_mktsegment, rn""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("c_mktsegment"))
            .orderBy((col("c_custkey") * lit(2654435761L)) % lit(4294967296L),
              col("c_custkey"))).cast("long"))
        .filter(col("rn") <= 50)
        .select("c_custkey", "c_mktsegment", "rn")
        .orderBy("c_mktsegment", "rn")),

    // Observation API: named metrics piggyback on the query's own
    // execution (CollectMetrics operator) — row counts and control
    // sums come back with the job, WITHOUT a second scan. The returned
    // row is the observed metrics; the 100 TB use is reconciliation
    // (rows in == rows out) on every production run for free.
    Q("obs_metrics",
      Some("""SELECT count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
             |       count(*) FILTER (WHERE l_discount >= 0.05) AS n_discounted
             |FROM lineitem""".stripMargin),
      (s, d) => {
        import s.implicits._
        val obs = org.apache.spark.sql.Observation()
        Tables.lineitem(s, d)
          .observe(obs,
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty_sum"),
            count(when(col("l_discount") >= 0.05, 1)).as("n_discounted"))
          .write.format("noop").mode("overwrite").save()
        val m = obs.get
        Seq((m("n").asInstanceOf[Long], m("qty_sum").asInstanceOf[Double],
          m("n_discounted").asInstanceOf[Long]))
          .toDF("n", "qty_sum", "n_discounted")
      }),

    // rule-driven expectations report (the data-quality contract a
    // pipeline gates on): each rule contributes one row with its
    // violation count — all row-level rules ride ONE scan/aggregation;
    // the uniqueness rule is its own keyed aggregate. Zero violations
    // is the expected steady state; the report shape (not the zeros)
    // is the operator.
    Q("dq_expectations",
      Some("""SELECT 'acctbal_in_range' AS rule, count(*) FILTER (
             |         WHERE c_acctbal < -1000 OR c_acctbal > 10000) AS n_violations
             |FROM customer
             |UNION ALL
             |SELECT 'custkey_not_null', count(*) FILTER (WHERE c_custkey IS NULL)
             |FROM customer
             |UNION ALL
             |SELECT 'custkey_unique',
             |       (SELECT count(*) FROM (
             |          SELECT c_custkey FROM customer GROUP BY c_custkey
             |          HAVING count(*) > 1) d)
             |UNION ALL
             |SELECT 'segment_in_set', count(*) FILTER (WHERE c_mktsegment NOT IN
             |         ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY'))
             |FROM customer
             |ORDER BY rule""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d)
        val rowRules = c.agg(
          count(when(col("c_acctbal") < -1000 || col("c_acctbal") > 10000, 1))
            .as("acctbal_in_range"),
          count(when(col("c_custkey").isNull, 1)).as("custkey_not_null"),
          count(when(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING",
            "FURNITURE", "HOUSEHOLD", "MACHINERY"), 1)).as("segment_in_set"))
          .select(expr(
            """stack(3,
              |  'acctbal_in_range', acctbal_in_range,
              |  'custkey_not_null', custkey_not_null,
              |  'segment_in_set',  segment_in_set) AS (rule, n_violations)""".stripMargin))
        val unique = c.groupBy("c_custkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("custkey_unique").as("rule"), col("n_violations"))
        rowRules.unionByName(unique).orderBy("rule")
      }),

    // duplicate survivorship: within each near-dup cluster pick the
    // golden record — longest text, ties to the lowest doc_id (the MDM
    // merge step after dedup_clusters; one window rank over cluster
    // assignments, no re-comparison of documents).
    Q("dedup_survivors",
      Some(s"""${graft.text.DedupQueries.clusterOracleCte},
             |r AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
             |             d.n_chars
             |      FROM documents d LEFT JOIN cl USING (doc_id))
             |SELECT cluster_id, doc_id AS survivor_id, n_chars,
             |       CAST(sz AS BIGINT) AS cluster_size
             |FROM (SELECT cluster_id, doc_id, n_chars,
             |             row_number() OVER (PARTITION BY cluster_id
             |               ORDER BY n_chars DESC, doc_id) AS rn,
             |             count(*) OVER (PARTITION BY cluster_id) AS sz
             |      FROM r) t
             |WHERE rn = 1 ORDER BY cluster_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.table(s, d, "documents")
        val edges = graft.text.Dedup.nearDupPairs(
          graft.io.Tables.documents(s, d), "doc_id", "text", 0.7)
          .select("id_a", "id_b")
        val cc = Graph.connectedComponents(edges)
          .withColumnRenamed("id", "doc_id")
        val assigned = docs.select("doc_id", "n_chars")
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("cluster_id"),
            col("n_chars"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("n_chars").desc, col("doc_id"))
        val ws = Window.partitionBy("cluster_id")
        assigned
          .withColumn("rn", row_number().over(w))
          .withColumn("cluster_size", count(lit(1)).over(ws))
          .filter(col("rn") === 1)
          .select(col("cluster_id"), col("doc_id").as("survivor_id"),
            col("n_chars"), col("cluster_size"))
          .orderBy("cluster_id")
      }),

    // incremental aggregation: yesterday's rollup + today's delta merge
    // into the exact full rollup WITHOUT rescanning history — counts
    // add, decimal sums add (associative), the double cast happens only
    // at the end. The pattern every incremental ETL rollup at 100 TB
    // relies on; mergeability is why the partials are decimals and
    // counts, never averages. Demonstrated by splitting events into two
    // "days" (even/odd ids) and merging their independent aggregates.
    Q("agg_incremental_merge",
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        def partial(f: org.apache.spark.sql.Column) = ev.filter(f)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(25,6)")).as("sum_dec"))
        val existing = partial(col("event_id") % 2 === 0)
        val delta = partial(col("event_id") % 2 === 1)
        existing.unionByName(delta)
          .groupBy("event_type")
          .agg(sum(col("n")).as("n"),
            sum(col("sum_dec")).cast("double").as("sum_value"))
          .orderBy("event_type")
      }),

    // boolean aggregates: every/any per group (the assertion shape of
    // data-quality rules: "all rows in the partition satisfy X").
    Q("agg_bool",
      Some("""SELECT o_orderpriority,
             |       bool_and(o_totalprice > 1000) AS all_over_1k,
             |       bool_or(o_orderstatus = 'F') AS any_final,
             |       count(*) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "F").as("any_final"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    // fixed-width histogram via width_bucket: the one-pass distribution
    // sketch (bucket key = integer → the groupBy shuffles tiny keys, not
    // values; at 100 TB this is how you eyeball a column's shape).
    Q("agg_histogram",
      // DuckDB has no width_bucket — the oracle spells out the SQL-
      // standard formula ((max-min)/num = 50000 exactly, so the
      // division is the same op in both engines).
      Some("""SELECT CASE WHEN o_totalprice < 0 THEN 0
             |            WHEN o_totalprice >= 600000 THEN 13
             |            ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
             |       count(*) AS n,
             |       CAST(round(min(o_totalprice)*100) AS BIGINT) AS min_c,
             |       CAST(round(max(o_totalprice)*100) AS BIGINT) AS max_c
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .groupBy(width_bucket(col("o_totalprice"), lit(0), lit(600000), lit(12))
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(round(min(o_totalprice)*100) AS BIGINT)").as("min_c"),
          expr("CAST(round(max(o_totalprice)*100) AS BIGINT)").as("max_c"))
        .orderBy("bucket")),

    // simple linear regression as exact-sum aggregation: slope and
    // intercept of value vs hour-of-day from the five classical sums,
    // every one exact (decimal value sums, integer hour sums), the
    // closed form evaluated identically in both engines on the 1e-6
    // grid — the regr_slope/regr_intercept surface without trusting
    // either engine's float accumulation order.
    Q("agg_regression",
      Some("""SELECT event_type,
             |       CAST(round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * 1e6)
             |            AS BIGINT) AS slope_e6,
             |       CAST(round((sy - (n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * sx)
             |                  / n * 1e6) AS BIGINT) AS intercept_e6
             |FROM (
             |  SELECT event_type,
             |         CAST(count(*) AS DOUBLE) AS n,
             |         CAST(sum(hour(ts)) AS DOUBLE) AS sx,
             |         CAST(sum(hour(ts)*hour(ts)) AS DOUBLE) AS sxx,
             |         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sy,
             |         CAST(sum(CAST(hour(ts) * value AS DECIMAL(25,6))) AS DOUBLE) AS sxy
             |  FROM events GROUP BY event_type) t
             |ORDER BY event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(hour(col("ts"))).cast("double").as("sx"),
          sum(hour(col("ts")) * hour(col("ts"))).cast("double").as("sxx"),
          sum(col("value").cast("decimal(25,6)")).cast("double").as("sy"),
          sum((hour(col("ts")) * col("value")).cast("decimal(25,6)"))
            .cast("double").as("sxy"))
        .select(col("event_type"),
          expr("""CAST(round((n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * 1e6)
                 |     AS BIGINT)""".stripMargin).as("slope_e6"),
          expr("""CAST(round((sy - (n*sxy - sx*sy) / nullif(n*sxx - sx*sx, 0) * sx)
                 |           / n * 1e6) AS BIGINT)""".stripMargin).as("intercept_e6"))
        .orderBy("event_type")),

    // time-interval RANGE frame: each event's trailing-1-hour value sum
    // per user — the frame is defined by the ORDER BY VALUE (ts), not
    // row position, so sparse and dense hours are handled uniformly.
    Q("window_range_frame",
      Some("""SELECT event_id,
             |       CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (
             |         PARTITION BY user_id ORDER BY ts
             |         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |         AS DOUBLE) AS hr_sum
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events_rf")
        s.sql("""SELECT event_id,
                |       CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (
                |         PARTITION BY user_id ORDER BY ts
                |         RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
                |         AS DOUBLE) AS hr_sum
                |FROM events_rf ORDER BY event_id""".stripMargin)
      }),

    // schema-evolution union: unionByName with allowMissingColumns —
    // the append that survives a producer adding/dropping columns
    // (missing columns null-fill; position never matters). The oracle
    // is DuckDB's UNION ALL BY NAME.
    Q("set_union_byname",
      Some("""SELECT * FROM (
             |  SELECT c_custkey, c_name, 'dim' AS src FROM customer
             |  UNION ALL BY NAME
             |  SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
             |         'fact' AS src FROM customer)
             |ORDER BY c_custkey, src""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d)
        val dim = c.select(col("c_custkey"), col("c_name"), lit("dim").as("src"))
        val fact = c.select(col("c_custkey"),
          expr("CAST(round(c_acctbal*100) AS BIGINT)").as("bal_cents"),
          lit("fact").as("src"))
        dim.unionByName(fact, allowMissingColumns = true)
          .orderBy("c_custkey", "src")
      }),

    // join-strategy hint surface: force a shuffled hash join where the
    // planner would broadcast — the knob an engine user reaches for
    // when the "small" side stops fitting (broadcast OOM) but sorting
    // both sides (SMJ) is still overkill. PlanShapeSpec pins the
    // physical operator.
    Q("join_hinted",
      Some("""SELECT o_orderkey, c_name FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d).hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name").orderBy("o_orderkey")),

    // semi-structured VARIANT (Spark 4): parse once into the binary
    // variant encoding, then typed path extraction — the open-schema
    // ingestion shape (at 100 TB, parse_json once at ingest and store
    // VARIANT; variant_get is then sub-linear in document size, no
    // re-parse per query).
    Q("json_variant",
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
             |       json_extract_string(props, '$.k') AS k_str,
             |       json_extract_string(props, '$.missing') AS missing_str
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'string')").as("missing_str"))
        .orderBy("event_id")),

    // small-file compaction (the maintenance job that keeps a 100 TB
    // table scannable): rewrite the table into exactly 4 files via
    // repartition — round-robin, so files are balanced — then prove the
    // round-trip from the compacted copy: file count off the parquet
    // _metadata column, row count, and an exact key checksum.
    Q("sink_compact",
      Some("""SELECT CAST(4 AS BIGINT) AS n_files, count(*) AS n_rows,
             |       CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
             |       CAST(sum(l_quantity) AS BIGINT) AS qty_sum
             |FROM lineitem""".stripMargin),
      (s, d) => {
        // per-invocation temp dir, NOT a fixed shared path: a second
        // process compacting the same sf dir would otherwise
        // overwrite-delete these files mid-scan of a concurrent reader
        // (the delete-under-reader class the stream stages fixed the
        // same way); stale dirs follow the SCALE.md staged-artifact
        // reaping policy
        val path = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(sys.props("java.io.tmpdir")),
          s"graft_io_compact_").resolve("lineitem_compact").toString
        Tables.lineitem(s, d).repartition(4)
          .write.mode("overwrite").parquet(path)
        s.read.parquet(path).select(
            col("l_orderkey"), col("l_quantity"),
            col("_metadata.file_path").as("fp"))
          .agg(count_distinct(col("fp")).as("n_files"),
            count(lit(1)).as("n_rows"),
            sum(col("l_orderkey")).as("key_sum"),
            sum(col("l_quantity")).cast("long").as("qty_sum"))
      })
  )
}
