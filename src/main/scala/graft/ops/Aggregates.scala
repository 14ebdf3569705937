package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.2 — absent from the reference,
  * mandated by the engine surface): hash aggregate with partial+final
  * (map-side combine) from Catalyst for free, exact + approximate
  * distinct, CUBE/ROLLUP grouping sets.
  *
  * Float discipline for oracle parity: monetary doubles are summed as
  * DECIMAL(18,2) (exact, order-independent — a distributed sum of raw
  * doubles is not associative) and only then cast to double. The same
  * cast appears in the DuckDB SQL, so both engines hash identically.
  */
object Aggregates {

  private val sumQty =
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
  private val sumPrice =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"

  def queries: Seq[Q] = Seq(
    // TPC-H Q1-shaped grouped aggregate: partial+final HashAggregate,
    // one shuffle on the (tiny-cardinality) group keys.
    Q("agg_group",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       count(*) AS count_order,
              |       $sumQty AS sum_qty,
              |       $sumPrice AS sum_price,
              |       $sumQty / count(*) AS avg_qty
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => {
        val sq = sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        val sp = sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("count_order"),
          sq.as("sum_qty"),
          sp.as("sum_price"),
          (sq / count(lit(1))).as("avg_qty")
        ).orderBy("l_returnflag", "l_linestatus")
      }),

    // min/max — exact on doubles and timestamps (no accumulation).
    Q("agg_minmax",
      Some("""SELECT o_orderpriority,
             |       min(o_totalprice) AS min_price,
             |       max(o_totalprice) AS max_price,
             |       min(o_orderdate) AS first_order,
             |       max(o_orderdate) AS last_order
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).groupBy("o_orderpriority").agg(
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        min("o_orderdate").as("first_order"),
        max("o_orderdate").as("last_order")).orderBy("o_orderpriority")),

    // exact COUNT(DISTINCT) — expands to a two-phase aggregate.
    Q("agg_count_distinct",
      Some("""SELECT event_type,
             |       count(DISTINCT user_id) AS n_users,
             |       count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => events(s, d).groupBy("event_type").agg(
        countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events")).orderBy("event_type")),

    // HLL-sketch distinct — single-pass, mergeable, the 100 TB answer to
    // COUNT(DISTINCT). Estimates differ across engines → rows-only check.
    Q("agg_approx_distinct",
      None,
      (s, d) => events(s, d).groupBy("event_type").agg(
        approx_count_distinct("user_id", 0.01).as("approx_users"))
        .orderBy("event_type")),

    // CUBE — all 4 grouping-set combinations in one shuffle.
    // Spark sorts NULLS FIRST by default; DuckDB NULLS LAST → pinned
    // explicitly on the oracle side.
    Q("agg_cube",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
              |       CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
              |       count(*) AS n,
              |       $sumQty AS sum_qty
              |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, g_rf, g_ls""".stripMargin),
      (s, d) => lineitem(s, d).cube("l_returnflag", "l_linestatus").agg(
        grouping("l_returnflag").cast("long").as("g_rf"),
        grouping("l_linestatus").cast("long").as("g_ls"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
          col("g_rf"), col("g_ls"))),

    // ROLLUP — hierarchical subtotals.
    Q("agg_rollup",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       count(*) AS n,
              |       $sumPrice AS sum_price
              |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, d) => lineitem(s, d).rollup("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    // exact full-row distinct (also the exact-dedup building block).
    Q("agg_distinct",
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin),
      (s, d) => orders(s, d).select("o_orderstatus", "o_orderpriority")
        .distinct().orderBy("o_orderstatus", "o_orderpriority"))
  )
}
