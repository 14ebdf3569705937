package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators: projection, filters, sorts, limits, set ops
  * (SURVEY.md §2.1 P1, F1-F3, O1-O3 + §2.2 set-op/top-k categories).
  *
  * Every query is declarative DataFrame API — Catalyst handles column
  * pruning + predicate pushdown into the parquet scan, and plans
  * orderBy+limit as TakeOrderedAndProject (no full sort at scale).
  */
object Relational {

  /** F3 — the reference's runtime schema gate (app.py:167-168,
    * etl_core.py:56-63): prefer `review`, fall back to `comments`,
    * else fail fast at plan-construction time (not mid-job). */
  def chooseTextColumn(df: DataFrame, preferred: Seq[String]): String =
    preferred.find(df.columns.contains).getOrElse {
      throw new IllegalArgumentException(
        s"required column missing: none of ${preferred.mkString(",")} in ${df.columns.mkString(",")}")
    }

  def queries: Seq[Q] = Seq(
    // O3 — full scan (reference `.all()`, app.py:196).
    Q("scan_all",
      Some("SELECT * FROM customer ORDER BY c_custkey"),
      (s, d) => customer(s, d).orderBy(col("c_custkey"))),

    // P1 — projection (reference app.py:199-206: job-history columns).
    Q("proj_select",
      Some("""SELECT o_orderkey AS id,
             |       concat('file_', o_orderkey, '.csv') AS filename,
             |       o_orderstatus AS status,
             |       o_orderdate AS upload_time
             |FROM orders ORDER BY id""".stripMargin),
      (s, d) => orders(s, d).select(
        col("o_orderkey").as("id"),
        concat(lit("file_"), col("o_orderkey").cast("string"), lit(".csv")).as("filename"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").as("upload_time")).orderBy("id")),

    // F1 — equality filter (reference `filter_by(...)`, app.py:83,100).
    Q("filter_eq",
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")),

    // F2 — pandas dropna(inplace=True) ≡ drop row if ANY column null
    // (reference etl_core.py:33; SURVEY §2.3.1 — "any", never "all").
    Q("filter_dropna",
      Some("""SELECT doc_id, text, lang FROM documents
             |WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
             |  AND source IS NOT NULL AND n_chars IS NOT NULL
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).na.drop("any")
        .select("doc_id", "text", "lang").orderBy("doc_id")),

    // F3 — schema gate + preferred-column selection (etl_core.py:56-63).
    Q("filter_schema_check",
      Some("SELECT doc_id, text AS target_text FROM documents ORDER BY doc_id"),
      (s, d) => {
        val df = documents(s, d)
        val target = chooseTextColumn(df, Seq("review", "comments", "text"))
        df.select(col("doc_id"), col(target).as("target_text")).orderBy("doc_id")
      }),

    // O1 — descending sort (reference app.py:196) with a total-order
    // tiebreaker so results are deterministic under the oracle hash.
    Q("sort_desc",
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
             |ORDER BY o_orderdate DESC, o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))),

    // O2 — `.first()` ≡ orderBy + LIMIT 1 (app.py:83,100,151); plans as
    // TakeOrderedAndProject, not a full sort.
    Q("limit_first",
      Some("""SELECT c_custkey, c_name FROM customer
             |ORDER BY c_custkey LIMIT 1""".stripMargin),
      (s, d) => customer(s, d).select("c_custkey", "c_name")
        .orderBy("c_custkey").limit(1)),

    // top-k — orderBy+limit → TakeOrderedAndProject (partial top-k per
    // partition, merge on driver; no global shuffle even at 100 TB).
    Q("topk",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, d) => orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)),

    // set ops — UNION (distinct), INTERSECT, EXCEPT.
    Q("set_union",
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .union(supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk")),

    Q("set_intersect",
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    Q("set_except",
      Some("""SELECT c_nationkey AS nk FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .except(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"))
  )
}
