package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions (SURVEY.md §2.2): ranking, analytic (lag/lead) and
  * frame-based running aggregates. One shuffle on the partition key each;
  * every orderBy inside a window carries a unique tiebreaker so results
  * are total-ordered (oracle-hash safe).
  */
object Windows {

  def queries: Seq[Q] = Seq(
    // per-group top-k via row_number — the scalable "top 3 per segment"
    // (no global sort; partial sort within each hash partition).
    Q("window_rank",
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal, rn FROM (
             |  SELECT c_custkey, c_mktsegment, c_acctbal,
             |         row_number() OVER (PARTITION BY c_mktsegment
             |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) t
             |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("c_mktsegment", "rn")
      }),

    // running sum per customer (frame: unbounded preceding → current).
    // Decimal accumulation → exact → cast double for the oracle hash.
    Q("window_frame",
      Some("""SELECT o_orderkey, o_custkey,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |            OVER (PARTITION BY o_custkey
             |                  ORDER BY o_orderdate, o_orderkey
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |            AS DOUBLE) AS running_spend
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_spend"))
          .orderBy("o_orderkey")
      }),

    // ranking-function battery: rank/dense_rank/percent_rank/ntile/
    // cume_dist (deterministic: the window order is total).
    Q("window_rank_fns",
      Some("""SELECT c_custkey,
             |       CAST(rank() OVER w AS BIGINT) AS rnk,
             |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             |       percent_rank() OVER w AS prnk,
             |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |       cume_dist() OVER w AS cdist
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        customer(s, d).select(col("c_custkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          cume_dist().over(w).as("cdist"))
          .orderBy("c_custkey")
      }),

    // value-function battery: first/last/nth value over a bounded frame.
    Q("window_value_fns",
      Some("""SELECT o_orderkey,
             |       first_value(o_totalprice) OVER w AS first_price,
             |       last_value(o_totalprice) OVER w AS latest_price,
             |       nth_value(o_totalprice, 2) OVER w AS second_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d).select(col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("latest_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .orderBy("o_orderkey")
      }),

    // analytic lag/lead over an event stream per user.
    Q("window_lag",
      Some("""SELECT event_id, user_id, ts,
             |       lag(event_type) OVER (PARTITION BY user_id
             |                             ORDER BY ts, event_id) AS prev_type,
             |       lead(event_type) OVER (PARTITION BY user_id
             |                              ORDER BY ts, event_id) AS next_type
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          lag("event_type", 1).over(w).as("prev_type"),
          lead("event_type", 1).over(w).as("next_type"))
          .orderBy("event_id")
      })
  )
}
