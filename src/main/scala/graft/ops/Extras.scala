package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Remaining operator-category coverage: percentiles, arg-min/max,
  * pivot/unpivot, array & map function batteries, conditionals,
  * cartesian products, and (rows-only) moment statistics.
  */
object Extras {

  def queries: Seq[Q] = Seq(
    // exact percentiles (sort-based interpolation — deterministic).
    Q("agg_percentile",
      Some("""SELECT o_orderpriority,
             |       quantile_cont(o_totalprice, 0.5) AS p50,
             |       quantile_cont(o_totalprice, 0.9) AS p90
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).groupBy("o_orderpriority").agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
        .orderBy("o_orderpriority")),

    // arg-min/arg-max via lexicographic struct min/max: min_by/max_by
    // (and DuckDB's arg_min/arg_max) pick an ARBITRARY row on value
    // ties — partition-merge order decides — so the tiebreak is pinned
    // into the ordering key itself: (price, orderkey). Equal prices
    // resolve to the smallest/largest orderkey deterministically in
    // both engines; same single-pass aggregation, no window.
    Q("agg_argminmax",
      Some("""SELECT o_orderpriority,
             |       (min({'p': o_totalprice, 'k': o_orderkey})).k AS cheapest_order,
             |       (max({'p': o_totalprice, 'k': o_orderkey})).k AS priciest_order
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).groupBy("o_orderpriority").agg(
        min(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("cheapest_order"),
        max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
          .getField("k").as("priciest_order"))
        .orderBy("o_orderpriority")),

    // moment statistics — partition-merge order perturbs low bits →
    // rows-only check (unit-level determinism is not the engine's claim
    // here; Spark and DuckDB both use streaming moment merges).
    Q("agg_stats",
      None,
      (s, d) => lineitem(s, d).groupBy("l_returnflag").agg(
        stddev(col("l_extendedprice")).as("sd_price"),
        variance(col("l_quantity")).as("var_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr"),
        skewness(col("l_discount")).as("skew_disc"),
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("p50_sketch"))
        .orderBy("l_returnflag")),

    // exact moment statistics: decimal sums (associative — no
    // accumulation-order noise) cast to double once, then the SAME
    // closed-form expressions on both engines → bit-identical stddev /
    // variance / correlation, unlike the streaming-merge natives above.
    // Outputs are micro-scaled BIGINTs (round(x*1e6)): DuckDB's
    // decimal→double cast rounds twice (int128→double, then /10^scale)
    // and can sit 1 ulp off Spark's correctly-rounded BigDecimal path;
    // the 1e-6 grid absorbs that while still pinning 6 decimals.
    Q("agg_stats_exact",
      Some("""SELECT l_returnflag,
             |       CAST(round(sqrt((s2 - s1*s1/n) / (n-1)) * 1e6) AS BIGINT) AS sd_price_e6,
             |       CAST(round((sq2 - sq1*sq1/n) / (n-1) * 1e6) AS BIGINT) AS var_qty_e6,
             |       CAST(round((spq - s1*sq1/n) / sqrt((s2 - s1*s1/n) * (sq2 - sq1*sq1/n)) * 1e6) AS BIGINT) AS qty_price_corr_e6
             |FROM (SELECT l_returnflag,
             |        CAST(count(*) AS DOUBLE) AS n,
             |        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq1,
             |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sq2,
             |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS spq
             |      FROM lineitem GROUP BY l_returnflag) t
             |ORDER BY l_returnflag""".stripMargin),
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("CAST(count(*) AS DOUBLE)").as("n"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("s1"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("s2"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sq1"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sq2"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("spq"))
        .select(col("l_returnflag"),
          expr("CAST(round(sqrt((s2 - s1*s1/n) / (n-1)) * 1e6) AS BIGINT)").as("sd_price_e6"),
          expr("CAST(round((sq2 - sq1*sq1/n) / (n-1) * 1e6) AS BIGINT)").as("var_qty_e6"),
          expr("CAST(round((spq - s1*sq1/n) / sqrt((s2 - s1*s1/n) * (sq2 - sq1*sq1/n)) * 1e6) AS BIGINT)").as("qty_price_corr_e6"))
        .orderBy("l_returnflag")),

    // pivot: per-user event-type counts as columns.
    Q("pivot_counts",
      Some("""SELECT user_id,
             |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
             |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
             |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
             |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
             |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = events(s, d).groupBy("user_id").pivot("event_type", types).count()
        p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("user_id")
      }),

    // unpivot/melt: wide lineitem metrics → long (metric, value) rows.
    Q("unpivot_metrics",
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),
      (s, d) => lineitem(s, d).unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")),

    // array-function battery over tokenized text (try_element_at for
    // ANSI-safe out-of-bounds → NULL, matching DuckDB list indexing).
    // array columns are serialized with concat_ws/array_to_string —
    // the driver's pandas compare can't sort/hash raw array cells.
    Q("array_funcs",
      Some("""SELECT doc_id,
             |       CAST(len(toks) AS BIGINT) AS n,
             |       toks[2] AS second_tok,
             |       array_to_string(list_slice(toks, 2, 4), ' ') AS mid,
             |       array_contains(toks, 'data') AS has_data,
             |       array_to_string(list_sort(list_distinct(toks)), ' ') AS vocab
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n"),
          try_element_at(col("toks"), lit(2)).as("second_tok"),
          concat_ws(" ", slice(col("toks"), 2, 3)).as("mid"),
          array_contains(col("toks"), "data").as("has_data"),
          concat_ws(" ", array_sort(array_distinct(col("toks")))).as("vocab"))
        .orderBy("doc_id")),

    // map-function battery: JSON props → typed MAP → keys/values/lookup.
    Q("map_funcs",
      Some("""SELECT event_id, 'k' AS ks,
             |       CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR) AS vs,
             |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_lookup
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        // parse once in its own projection — three references to the
        // same from_json would otherwise parse the JSON 3× per row
        events(s, d).select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)).as("m"))
          .select(col("event_id"),
            concat_ws(",", map_keys(col("m"))).as("ks"),
            concat_ws(",", map_values(col("m")).cast("array<string>")).as("vs"),
            col("m").getItem("k").as("k_lookup"))
          .orderBy("event_id")
      }),

    // conditional battery: CASE/if/greatest/least/coalesce/nullif.
    Q("conditional_funcs",
      Some("""SELECT o_orderkey,
             |       CASE WHEN o_totalprice > 200000 THEN 'big'
             |            WHEN o_totalprice > 100000 THEN 'mid'
             |            ELSE 'small' END AS bucket,
             |       if(o_orderstatus = 'F', 'done', 'open') AS state,
             |       greatest(o_totalprice, 50000.0) AS floor_price,
             |       least(o_totalprice, 300000.0) AS cap_price,
             |       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d).select(col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        when(col("o_orderstatus") === "F", "done").otherwise("open").as("state"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floor_price"),
        least(col("o_totalprice"), lit(300000.0)).as("cap_price"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_norm"))
        .orderBy("o_orderkey")),

    // predicate battery: LIKE / IN-list / BETWEEN / compound boolean.
    Q("filter_predicates",
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
             |WHERE o_orderpriority LIKE '%URGENT'
             |  AND o_orderstatus IN ('F', 'O')
             |  AND o_totalprice BETWEEN 50000 AND 250000
             |  AND NOT (o_custkey = 1)
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .filter(col("o_orderpriority").like("%URGENT") &&
          col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(50000, 250000) &&
          !(col("o_custkey") === 1))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")),

    // array higher-order functions: filter/transform/exists/aggregate.
    Q("array_hof_funcs",
      Some("""SELECT doc_id,
             |       CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT) AS n_long,
             |       array_to_string(list_transform(toks, x -> upper(x)), ' ') AS toks_uc,
             |       len(list_filter(toks, x -> x = 'spark')) > 0 AS has_spark,
             |       CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
             |            AS BIGINT) AS total_chars
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(filter(col("toks"), x => length(x) > 4)).cast("long").as("n_long"),
          concat_ws(" ", transform(col("toks"), x => upper(x))).as("toks_uc"),
          exists(col("toks"), x => x === "spark").as("has_spark"),
          aggregate(transform(col("toks"), x => length(x).cast("long")),
            lit(0L), (acc, v) => acc + v).as("total_chars"))
        .orderBy("doc_id")),

    // extended string battery: pad/translate/split_part/format/reverse/
    // repeat/left/right/contains/position/chr.
    Q("str_funcs2",
      Some("""SELECT c_custkey,
             |       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
             |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
             |       split_part(c_name, '#', 2) AS name_num,
             |       printf('%s|%s', c_mktsegment, c_name) AS fmt,
             |       reverse(c_mktsegment) AS seg_rev,
             |       repeat('-', 3) AS dashes,
             |       left(c_name, 4) AS name_l,
             |       right(c_name, 3) AS name_r,
             |       contains(c_name, '001') AS has_001,
             |       CAST(instr(c_name, '#') AS BIGINT) AS hash_pos
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d).select(col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        element_at(split(col("c_name"), "#"), 2).as("name_num"),
        format_string("%s|%s", col("c_mktsegment"), col("c_name")).as("fmt"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        lit("---").as("dashes"),
        substring(col("c_name"), 1, 4).as("name_l"),
        col("c_name").substr(length(col("c_name")) - 2, lit(3)).as("name_r"),
        col("c_name").contains("001").as("has_001"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"))
        .orderBy("c_custkey")),

    // bitwise battery.
    Q("bitwise_funcs",
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_orderkey & 255 AS k_and,
             |       l_orderkey | 1 AS k_or,
             |       xor(l_orderkey, l_linenumber) AS k_xor,
             |       CAST(l_linenumber << 4 AS BIGINT) AS k_shl,
             |       l_orderkey >> 2 AS k_shr
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(255).as("k_and"),
        col("l_orderkey").bitwiseOR(1).as("k_or"),
        col("l_orderkey").bitwiseXOR(col("l_linenumber").cast("long")).as("k_xor"),
        shiftleft(col("l_linenumber"), 4).cast("long").as("k_shl"),
        shiftright(col("l_orderkey"), 2).as("k_shr"))
        .orderBy("l_orderkey", "l_linenumber")),

    // cartesian product (explicit crossJoin — the only non-equi-join
    // shape with no key; bounded inputs only).
    Q("cross_join",
      Some("""SELECT a.r_name AS from_region, b.r_name AS to_region
             |FROM region a, region b WHERE a.r_regionkey <> b.r_regionkey
             |ORDER BY from_region, to_region""".stripMargin),
      (s, d) => {
        val a = region(s, d).select(col("r_regionkey").as("ak"), col("r_name").as("from_region"))
        val b = region(s, d).select(col("r_regionkey").as("bk"), col("r_name").as("to_region"))
        a.crossJoin(b).filter(col("ak") =!= col("bk"))
          .select("from_region", "to_region")
          .orderBy("from_region", "to_region")
      })
  )
}
