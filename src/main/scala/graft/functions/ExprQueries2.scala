package graft.functions

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Round-2 function batteries: JSON generation/introspection, map
  * higher-order functions, extended array ops, and timestamp/epoch
  * arithmetic. Array/map results are string-serialized (driver-compare
  * constraint); formulas are integer/string-exact in both engines.
  */
object ExprQueries2 {

  def queries: Seq[Q] = Seq(
    // JSON battery 2: path extraction, generation, key introspection.
    Q("json_funcs2",
      Some("""SELECT event_id,
             |       json_extract_string(props, '$.k') AS k_str,
             |       to_json(struct_pack(n := event_id)) AS ev_json,
             |       array_to_string(json_keys(props), ',') AS prop_keys
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        to_json(struct(col("event_id").as("n"))).as("ev_json"),
        concat_ws(",", json_object_keys(col("props"))).as("prop_keys"))
        .orderBy("event_id")),

    // map higher-order functions over the typed props map (single key
    // 'k' — the oracle mirrors each op on the extracted value).
    Q("map_funcs2",
      Some("""SELECT event_id, kv * 2 AS k_doubled,
             |       CAST(CASE WHEN kv > 50 THEN 1 ELSE 0 END AS BIGINT) AS n_high,
             |       CAST(2 AS BIGINT) AS n_merged,
             |       'k' AS keys_str
             |FROM (SELECT event_id,
             |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv
             |      FROM events) t
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val mapT = org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)
        events(s, d)
          .select(col("event_id"), from_json(col("props"), mapT).as("m"))
          .select(col("event_id"),
            transform_values(col("m"), (_, v) => v * 2)
              .getItem("k").as("k_doubled"),
            size(map_filter(col("m"), (_, v) => v > 50))
              .cast("long").as("n_high"),
            size(map_concat(col("m"), map(lit("extra"), lit(1))))
              .cast("long").as("n_merged"),
            concat_ws(",", map_keys(col("m"))).as("keys_str"))
          .orderBy("event_id")
      }),

    // array battery 2: position/remove/flatten/repeat/zip_with/compact.
    Q("array_funcs2",
      Some("""SELECT doc_id,
             |       CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS pos_data,
             |       array_to_string(list_filter(toks, x -> x <> 'the'), ' ') AS no_the,
             |       array_to_string(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), ' ') AS flat4,
             |       array_to_string([toks[1], toks[1], toks[1]], ',') AS rep3,
             |       array_to_string(list_transform(range(len(toks)),
             |         i -> toks[i+1] || '|' || toks[len(toks)-i]), ' ') AS zipcat,
             |       CAST(len(list_filter([toks[1], NULL, toks[2]], x -> x IS NOT NULL)) AS BIGINT) AS n_compact
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          array_position(col("toks"), "data").as("pos_data"),
          concat_ws(" ", array_remove(col("toks"), "the")).as("no_the"),
          concat_ws(" ", flatten(array(slice(col("toks"), 1, 2),
            slice(col("toks"), 3, 2)))).as("flat4"),
          concat_ws(",", array_repeat(try_element_at(col("toks"), lit(1)), 3)).as("rep3"),
          concat_ws(" ", zip_with(col("toks"), reverse(col("toks")),
            (a, b) => concat(a, lit("|"), b))).as("zipcat"),
          size(array_compact(array(try_element_at(col("toks"), lit(1)), lit(null),
            try_element_at(col("toks"), lit(2))))).cast("long").as("n_compact"))
        .orderBy("doc_id")),

    // user-registered Scala UDF called through the SQL surface (the
    // escape hatch the reference's per-row sentiment maps to; native
    // expressions stay preferred — see expr_sentiment — but the
    // registration surface itself must work).
    Q("udf_sql",
      Some("""SELECT doc_id,
             |       regexp_replace(lower(text), '[^a-z0-9]+', '-', 'g') AS slug
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        s.udf.register("graft_slug", (t: String) =>
          if (t == null) null
          else t.toLowerCase.replaceAll("[^a-z0-9]+", "-"))
        documents(s, d).createOrReplaceTempView("documents_u")
        s.sql("""SELECT doc_id, graft_slug(text) AS slug
                |FROM documents_u ORDER BY doc_id""".stripMargin)
      }),

    // error-safe arithmetic battery (ANSI mode's escape hatches): the
    // try_ variants return NULL where the strict form would fail the
    // job — division by zero, numeric overflow, uncastable strings.
    // At 100 TB one poisoned row must not kill a 6-hour job; try_* is
    // the per-expression containment (PERMISSIVE csv is the per-row
    // one, src_csv_permissive).
    Q("try_funcs",
      Some("""SELECT event_id,
             |       CASE WHEN kv = 0 THEN NULL ELSE 100 / kv END AS safe_div,
             |       TRY_CAST(props AS INTEGER) AS bad_cast,
             |       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS good_cast,
             |       CAST(9223372036854775807 AS BIGINT) + NULL AS overflow_add
             |FROM (SELECT event_id, props,
             |        CAST(json_extract_string(props, '$.k') AS INTEGER) AS kv
             |      FROM events) t
             |ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d)
        .select(col("event_id"), col("props"),
          get_json_object(col("props"), "$.k").cast("int").as("kv"))
        .select(col("event_id"),
          try_divide(lit(100), col("kv")).as("safe_div"),
          expr("try_cast(props AS INT)").as("bad_cast"),
          expr("try_cast(get_json_object(props, '$.k') AS INT)").as("good_cast"),
          try_add(lit(Long.MaxValue), lit(null).cast("bigint")).as("overflow_add"))
        .orderBy("event_id")),

    // timestamp/epoch battery over events. The oracle renders epoch
    // seconds via make_timestamp (timezone-NAIVE) — to_timestamp would
    // be TIMESTAMPTZ and silently depend on the check host's TimeZone.
    Q("ts_funcs",
      Some("""SELECT event_id,
             |       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             |       strftime(make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS from_epoch,
             |       CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
             |       CAST(hour(ts) AS BIGINT) AS h,
             |       CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS mins_into_day
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d).select(col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        from_unixtime(unix_timestamp(col("ts"))).as("from_epoch"),
        date_trunc("week", col("ts")).as("week_start"),
        hour(col("ts")).cast("long").as("h"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("mins_into_day"))
        .orderBy("event_id"))
  )
}
