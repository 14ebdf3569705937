package graft.functions

import graft.Q
import graft.io.Tables._
import graft.text.Sentiment
import org.apache.spark.sql.functions._

/** Scalar-function queries (SURVEY.md §2.1 X1-X7 + §2.2 string / date /
  * math / json categories). All pure Column compositions — everything
  * stays inside whole-stage codegen.
  */
object ExprQueries {

  def queries: Seq[Q] = Seq(
    // X1/X2 — pandas astype(str).apply(len) with NaN→"nan" parity
    // (app.py:171; SURVEY §2.3.2 — missing value has length 3).
    Q("expr_length",
      Some("""SELECT doc_id, length(coalesce(text, 'nan')) AS comment_length
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"),
        Exprs.lengthNanParity(col("text")).as("comment_length"))
        .orderBy("doc_id")),

    // X2 — cast to string.
    Q("expr_cast_str",
      Some("""SELECT doc_id, CAST(n_chars AS VARCHAR) AS n_chars_str
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"), col("n_chars").cast("string").as("n_chars_str"))
        .orderBy("doc_id")),

    // X3 — sentiment enrichment, deterministic lexicon scorer with the
    // reference's exact label contract (etl_core.py:36-60). Pure Column
    // version; the batched external-call shape is Sentiment.enrichBatched.
    Q("expr_sentiment",
      Some(s"""SELECT doc_id, ${Sentiment.oracleCaseSql("text")} AS sentiment_result
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"), Sentiment.sentimentCol(col("text")).as("sentiment_result"))
        .orderBy("doc_id")),

    // X4 — derived-column append (df["new"] = ..., app.py:171).
    Q("expr_withcolumn",
      Some("""SELECT doc_id, n_chars + 1 AS n_chars_plus, upper(lang) AS lang_uc
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .withColumn("n_chars_plus", col("n_chars") + 1)
        .withColumn("lang_uc", upper(col("lang")))
        .select("doc_id", "n_chars_plus", "lang_uc")
        .orderBy("doc_id")),

    // X5 — strftime("%Y-%m-%d %H:%M:%S") (app.py:205).
    Q("expr_date_format",
      Some("""SELECT o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS upload_time_str
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        Exprs.formatUploadTime(col("o_orderdate")).as("upload_time_str"))
        .orderBy("o_orderkey")),

    // X6 — default-timestamp fill (models.py:14,31); deterministic default
    // so the oracle can hash it (production callers pass current_timestamp).
    Q("expr_default_ts",
      Some("""SELECT event_id,
             |       coalesce(ts, TIMESTAMP '2026-01-01 00:00:00') AS ts_filled
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d).select(
        col("event_id"),
        Exprs.withDefaultTs(col("ts"),
          expr("TIMESTAMP '2026-01-01 00:00:00'")).as("ts_filled"))
        .orderBy("event_id")),

    // X7 — salted password hash (app.py:88 werkzeug semantics: store
    // hash, verify by recompute-and-compare).
    Q("expr_hash_pw",
      Some("""SELECT c_custkey,
             |       sha256(concat(c_name, ':', 'pw')) AS password_hash,
             |       sha256(concat(c_name, ':', 'pw'))
             |         = sha256(concat(c_name, ':', 'pw')) AS verify_ok
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        Exprs.hashPassword(lit("pw"), col("c_name")).as("password_hash"),
        Exprs.checkPassword(lit("pw"), col("c_name"),
          Exprs.hashPassword(lit("pw"), col("c_name"))).as("verify_ok"))
        .orderBy("c_custkey")),

    // string function battery (§2.2): lower/upper/trim/substring/replace/
    // concat_ws/length.
    Q("str_funcs",
      Some("""SELECT c_custkey,
             |       lower(c_name) AS name_lc,
             |       upper(c_mktsegment) AS seg_uc,
             |       substring(c_name, 1, 8) AS name_prefix,
             |       replace(c_name, '#', '-') AS name_dash,
             |       trim(concat(' ', c_name, ' ')) AS name_trim,
             |       concat_ws('|', c_name, c_mktsegment) AS name_seg,
             |       CAST(length(c_name) AS BIGINT) AS name_len
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d).select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lc"),
        upper(col("c_mktsegment")).as("seg_uc"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        // literal replace (matches the oracle's replace() semantics —
        // regexp_replace compiles the search string as a regex, which
        // only coincides while it contains no metacharacters)
        expr("replace(c_name, '#', '-')").as("name_dash"),
        trim(concat(lit(" "), col("c_name"), lit(" "))).as("name_trim"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("name_seg"),
        length(col("c_name")).cast("long").as("name_len"))
        .orderBy("c_custkey")),

    // date function battery: extract fields + truncate.
    Q("date_funcs",
      Some("""SELECT o_orderkey,
             |       CAST(year(o_orderdate) AS BIGINT) AS y,
             |       CAST(month(o_orderdate) AS BIGINT) AS m,
             |       CAST(day(o_orderdate) AS BIGINT) AS dom,
             |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             |       o_orderdate + INTERVAL 7 DAY AS due_date
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("due_date"))
        .orderBy("o_orderkey")),

    // math function battery (transcendentals avoided: their last-ulp
    // rounding is libm-dependent; sqrt/floor/abs/mod are IEEE-exact).
    Q("math_funcs",
      Some("""SELECT l_orderkey, l_linenumber,
             |       abs(l_quantity - 25.0) AS qty_dev,
             |       sqrt(l_quantity) AS qty_sqrt,
             |       CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
             |       CAST(l_orderkey % 7 AS BIGINT) AS key_mod
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        floor(col("l_discount") * 100).cast("long").as("disc_pct"),
        pmod(col("l_orderkey"), lit(7)).cast("long").as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber")),

    // json functions — typed extraction from the events.props JSON column
    // (from_json with an explicit schema; null-safe, ANSI-safe).
    Q("json_funcs",
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d).select(
        col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_val"))
        .orderBy("event_id"))
  )
}
