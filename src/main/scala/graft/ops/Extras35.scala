package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-33 operators: cross-table as-of enrichment and the
  * duplicate-natural-key report.
  */
object Extras35 {

  def queries: Seq[Q] = Seq(
    // cross-TABLE as-of: each purchase event picks up the customer's
    // most recent order at that moment (order history and event stream
    // are different tables with different schemas — the enrichment
    // shape feature stores run). Same one-shuffle union formulation:
    // both sides keyed on the customer, one partition-sort, running
    // last — no per-row probe into the orders table.
    Q("join_asof_cross_table",
      Some("""SELECT e.event_id, e.user_id,
             |       (SELECT max(o.o_orderkey) FROM orders o
             |        WHERE o.o_custkey = e.user_id
             |          AND o.o_orderdate <= e.ts
             |          AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
             |                               WHERE o2.o_custkey = e.user_id
             |                                 AND o2.o_orderdate <= e.ts))
             |         AS last_order_key
             |FROM events e WHERE e.event_type = 'purchase'
             |ORDER BY e.event_id""".stripMargin),
      (s, d) => {
        val probes = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("k"), col("ts").as("t"),
            col("event_id"), lit(null).cast("long").as("ok"),
            lit(1).as("is_probe"))
        // orders sort before probes at equal timestamps (≤ semantics);
        // within one order date the max orderkey wins (ties broken by
        // the key itself so the running last is deterministic)
        val orders = Tables.orders(s, d)
          .select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
            lit(null).cast("long").as("event_id"),
            col("o_orderkey").as("ok"), lit(0).as("is_probe"))
        val w = Window.partitionBy("k").orderBy(col("t"), col("is_probe"),
          col("ok").asc_nulls_last)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        probes.unionByName(orders)
          .withColumn("last_order_key", last("ok", ignoreNulls = true).over(w))
          .filter(col("is_probe") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            col("last_order_key"))
          .orderBy("event_id")
      }),

    // duplicate-natural-key report: (orderkey, linenumber) SHOULD be
    // unique in lineitem and is not in this feed — the report lists
    // every violating key with its multiplicity, the first check run
    // against any upstream extract. One aggregation on the key.
    Q("dq_duplicate_keys",
      Some("""SELECT l_orderkey, l_linenumber, CAST(count(*) AS BIGINT) AS n_copies
             |FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).cast("long").as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy("l_orderkey", "l_linenumber")))
}
