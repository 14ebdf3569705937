package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-45 operator: leaderboard rank movement. */
object Extras47 {

  def queries: Seq[Q] = Seq(
    // rank movement: each customer's position on the revenue
    // leaderboard in 1998 vs 1997 and how far they moved — the
    // "biggest climbers/fallers" view. Ranks are row_number over
    // (exact cents DESC, custkey) per year — total order, so ties
    // can't wobble across engines — and each year's ranking windows
    // over the already-reduced per-customer aggregate, never the fact
    // table. Inner join keeps customers active in both years.
    Q("analytics_rank_movement",
      Some("""WITH r AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |             o_custkey,
             |             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |                  AS BIGINT) AS rev_cents
             |           FROM orders WHERE year(o_orderdate) IN (1997, 1998)
             |           GROUP BY 1, 2),
             |rk AS (SELECT yr, o_custkey, rev_cents,
             |         CAST(row_number() OVER (PARTITION BY yr
             |              ORDER BY rev_cents DESC, o_custkey) AS BIGINT) AS rnk
             |       FROM r)
             |SELECT a.o_custkey,
             |       b.rev_cents AS rev_prev, a.rev_cents AS rev_cur,
             |       b.rnk AS rank_prev, a.rnk AS rank_cur,
             |       b.rnk - a.rnk AS rank_delta
             |FROM rk a JOIN rk b
             |  ON a.o_custkey = b.o_custkey AND a.yr = 1998 AND b.yr = 1997
             |ORDER BY a.rnk""".stripMargin),
      (s, d) => {
        val r = Tables.orders(s, d)
          .filter(year(col("o_orderdate")).isin(1997, 1998))
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            col("o_custkey"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long").as("rev_cents"))
        val w = Window.partitionBy("yr")
          .orderBy(col("rev_cents").desc, col("o_custkey"))
        val rk = r.withColumn("rnk", row_number().over(w).cast("long"))
        val a = rk.filter(col("yr") === 1998)
          .select(col("o_custkey"), col("rev_cents").as("rev_cur"),
            col("rnk").as("rank_cur"))
        val b = rk.filter(col("yr") === 1997)
          .select(col("o_custkey"), col("rev_cents").as("rev_prev"),
            col("rnk").as("rank_prev"))
        a.join(b, "o_custkey")
          .select(col("o_custkey"), col("rev_prev"), col("rev_cur"),
            col("rank_prev"), col("rank_cur"),
            (col("rank_prev") - col("rank_cur")).as("rank_delta"))
          .orderBy("rank_cur")
      }))
}
