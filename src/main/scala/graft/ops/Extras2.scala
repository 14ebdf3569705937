package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Round-2 coverage widening: outer joins, multiset set-ops, lateral
  * explode, regex battery, extended date arithmetic, recursive CTE
  * (Spark 4 WITH RECURSIVE), and ordered string aggregation.
  */
object Extras2 {

  def queries: Seq[Q] = Seq(
    // full outer join: every customer and every order survive; null
    // sides pinned with coalesce so the compare is total. Driver-scale
    // note: both sides shuffle on the key; Catalyst plans SMJ.
    Q("join_outer",
      Some("""SELECT coalesce(c.c_custkey, -1) AS cust,
             |       coalesce(o.o_orderkey, -1) AS ord,
             |       coalesce(c.c_mktsegment, 'NO_CUSTOMER') AS seg
             |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
             |ORDER BY cust, ord""".stripMargin),
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), lit(-1L)).as("cust"),
          coalesce(col("o_orderkey"), lit(-1L)).as("ord"),
          coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("seg"))
        .orderBy("cust", "ord")),

    // multiset intersection: order priorities seen under BOTH statuses,
    // with multiplicity = min of the two sides (INTERSECT ALL).
    Q("set_intersect_all",
      Some("""SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT ALL
             |SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderpriority")
        .intersectAll(orders(s, d).filter(col("o_orderstatus") === "O")
          .select("o_orderpriority"))
        .orderBy("o_orderpriority")),

    // multiset difference (EXCEPT ALL) — same shape, surplus copies kept.
    Q("set_except_all",
      Some("""SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT ALL
             |SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderpriority")
        .exceptAll(orders(s, d).filter(col("o_orderstatus") === "O")
          .select("o_orderpriority"))
        .orderBy("o_orderpriority")),

    // UDTF-shaped lateral generator through the SQL parser.
    Q("sql_lateral_explode",
      Some("""SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
             |FROM documents WHERE length(trim(text)) > 0
             |ORDER BY doc_id, tok""".stripMargin),
      (s, d) => {
        SqlSurface.registerViews(s, d, "documents")
        s.sql("""SELECT doc_id, tok
                |FROM documents
                |LATERAL VIEW explode(split(trim(text), ' +')) x AS tok
                |WHERE length(trim(text)) > 0
                |ORDER BY doc_id, tok""".stripMargin)
      }),

    // regex battery: extract / extract-all count / global replace / rlike.
    Q("regex_funcs",
      Some("""SELECT doc_id,
             |       regexp_extract(text, '([0-9]+)', 1) AS first_num,
             |       CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
             |       regexp_replace(text, '[0-9]+', '#', 'g') AS redacted,
             |       regexp_matches(text, 'data') AS has_data
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(col("doc_id"),
        regexp_extract(col("text"), "([0-9]+)", 1).as("first_num"),
        size(regexp_extract_all(col("text"), lit("[aeiou]"), lit(0)))
          .cast("long").as("n_vowels"),
        regexp_replace(col("text"), "[0-9]+", "#").as("redacted"),
        col("text").rlike("data").as("has_data"))
        .orderBy("doc_id")),

    // extended date arithmetic (dayofweek is 1=Sunday in Spark, 0=Sunday
    // in DuckDB → +1 on the oracle side).
    Q("date_funcs2",
      Some("""SELECT o_orderkey,
             |       CAST(d + INTERVAL '3' MONTH AS DATE) AS plus3m,
             |       last_day(d) AS eom,
             |       CAST(quarter(d) AS BIGINT) AS qtr,
             |       CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
             |       CAST(weekofyear(d) AS BIGINT) AS iso_week,
             |       CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) AS days_since,
             |       make_date(CAST(year(d) AS INTEGER), 1, 1) AS year_start
             |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders) t
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
        .select(col("o_orderkey"),
          add_months(col("d"), 3).as("plus3m"),
          last_day(col("d")).as("eom"),
          quarter(col("d")).cast("long").as("qtr"),
          dayofweek(col("d")).cast("long").as("dow"),
          weekofyear(col("d")).cast("long").as("iso_week"),
          datediff(col("d"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
          make_date(year(col("d")), lit(1), lit(1)).as("year_start"))
        .orderBy("o_orderkey")),

    // recursive CTE (Spark 4 WITH RECURSIVE): a 1995 month spine LEFT
    // JOINed to order counts — the calendar-densification shape.
    // Scale note: orders is aggregated to per-month counts FIRST
    // (distributed partial+final agg), and only the tiny spine joins the
    // tiny aggregate — a spine-streaming outer join would force Spark to
    // broadcast the fact table (BNLJ preserves the streamed side).
    Q("sql_recursive_cte",
      Some("""WITH RECURSIVE months(m) AS (
             |  SELECT DATE '1995-01-01'
             |  UNION ALL
             |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
             |  WHERE m < DATE '1995-12-01'),
             |agg AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
             |               count(*) AS n
             |        FROM orders GROUP BY 1)
             |SELECT m, coalesce(n, 0) AS n_orders
             |FROM months LEFT JOIN agg ON agg.mo = months.m
             |ORDER BY m""".stripMargin),
      (s, d) => {
        SqlSurface.registerViews(s, d, "orders")
        s.sql("""WITH RECURSIVE months(m) AS (
                |  SELECT DATE '1995-01-01'
                |  UNION ALL
                |  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
                |  WHERE m < DATE '1995-12-01'),
                |agg AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                |               count(*) AS n
                |        FROM orders GROUP BY 1)
                |SELECT m, coalesce(n, 0) AS n_orders
                |FROM months LEFT JOIN agg ON agg.mo = months.m
                |ORDER BY m""".stripMargin)
      }),

    // reproducible train/test split: hash-bucket assignment from md5 of
    // the stable id — deterministic across engines, runs, cluster sizes
    // and retries (never rand()/TABLESAMPLE, which are neither).
    Q("split_train_test",
      Some("""SELECT doc_id,
             |       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
             |                 IN ('0','1','2','3','4','5','6','7','8','9','a','b','c')
             |            THEN 'train' ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0123456789abc".map(_.toString): _*), "train")
          .otherwise("test").as("split"))
        .orderBy("doc_id")),

    // edit-distance battery (fuzzy string matching): levenshtein + a
    // µ-scaled normalized similarity ratio.
    Q("fuzzy_str_funcs",
      Some("""SELECT c_custkey,
             |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_bld,
             |       CAST(round((1.0 - CAST(levenshtein(c_mktsegment, 'BUILDING') AS DOUBLE)
             |            / greatest(length(c_mktsegment), length('BUILDING'))) * 1e6) AS BIGINT) AS sim_e6
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d).select(col("c_custkey"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev_bld"),
        expr("""CAST(round((1.0 - CAST(levenshtein(c_mktsegment, 'BUILDING') AS DOUBLE)
                / greatest(length(c_mktsegment), length('BUILDING'))) * 1e6) AS BIGINT)""")
          .as("sim_e6"))
        .orderBy("c_custkey")),

    // XML ingestion surface: from_xml over a wire-format column (built
    // from events — the oracle checks the round-tripped value).
    Q("xml_funcs",
      Some("""SELECT event_id, CAST(user_id AS BIGINT) AS xml_uid
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d)
        .withColumn("xml", concat(lit("<r><uid>"), col("user_id"), lit("</uid></r>")))
        .select(col("event_id"),
          from_xml(col("xml"),
            org.apache.spark.sql.types.StructType.fromDDL("uid BIGINT"))
            .getField("uid").as("xml_uid"))
        .orderBy("event_id")),

    // aggregate FILTER clause + HAVING through the SQL parser (testdata
    // has no NULLs, so conditional aggregation is derived via FILTER).
    Q("agg_filter_having",
      Some("""SELECT o_orderpriority,
             |       count(*) AS n_all,
             |       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f
             |FROM orders GROUP BY o_orderpriority
             |HAVING count(*) > 10
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        SqlSurface.registerViews(s, d, "orders")
        s.sql("""SELECT o_orderpriority,
                |       count(*) AS n_all,
                |       count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
                |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                |            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f
                |FROM orders GROUP BY o_orderpriority
                |HAVING count(*) > 10
                |ORDER BY o_orderpriority""".stripMargin)
      }),

    // null-safe comparison battery over derived NULLs (nullif):
    // IS [NOT] DISTINCT FROM (<=>), nvl2, and null-pinned ordering.
    Q("null_safe_ops",
      Some("""SELECT c_custkey,
             |       nullif(c_mktsegment, 'BUILDING') AS seg_n,
             |       c_mktsegment IS DISTINCT FROM 'BUILDING' AS not_bld,
             |       nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL AS was_bld,
             |       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
             |            THEN 'kept' ELSE 'nulled' END AS nvl2_tag
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d).select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_n"),
        (!(col("c_mktsegment") <=> lit("BUILDING"))).as("not_bld"),
        (nullif(col("c_mktsegment"), lit("BUILDING")) <=> lit(null)).as("was_bld"),
        nvl2(nullif(col("c_mktsegment"), lit("BUILDING")),
          lit("kept"), lit("nulled")).as("nvl2_tag"))
        .orderBy("c_custkey")),

    // DataFrameNaFunctions surface: fill + replace over derived NULLs.
    Q("fillna_funcs",
      Some("""SELECT c_custkey,
             |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_filled,
             |       CASE c_name WHEN 'Customer#000000001' THEN 'FIRST'
             |            ELSE c_name END AS name_repl
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_filled"),
          col("c_name").as("name_repl"))
        .na.fill(Map("seg_filled" -> "NONE"))
        .na.replace("name_repl", Map("Customer#000000001" -> "FIRST"))
        .orderBy("c_custkey")),

    // explicit null ordering: DESC NULLS LAST (Spark's desc default is
    // NULLS LAST, but the intent is pinned on both sides).
    Q("sort_nulls_last",
      Some("""SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_n
             |FROM customer
             |ORDER BY seg_n DESC NULLS LAST, c_custkey""".stripMargin),
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_n"))
        .orderBy(col("seg_n").desc_nulls_last, col("c_custkey"))),

    // ordered string aggregation (LISTAGG shape): deterministic via an
    // explicit sort of the collected list. Buffer bound: the group is a
    // region and the values are nation names — dimension-table
    // cardinality (25 rows total), never the fact stream.
    Q("agg_stringagg",
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),
      (s, d) => nation(s, d).groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("n_regionkey"))
  )
}
