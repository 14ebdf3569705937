package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-40 operators: the pairwise correlation matrix and
  * inter-purchase interval stats.
  */
object Extras42 {

  def queries: Seq[Q] = Seq(
    // correlation matrix over lineitem's four measures — the feature-
    // selection staple ("drop one of every highly-correlated pair").
    // ONE map-side-combined pass computes all 14 exact power sums
    // (4 Σx, 4 Σx² and 6 Σxy as DECIMAL(38,0) — overflow-proof far
    // beyond 100 TB); the 6 pairwise Pearson closed forms then unfold
    // from that single row, so the matrix costs one scan regardless of
    // how many pairs it reports.
    Q("agg_corr_matrix",
      Some("""WITH v AS (SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
             |             CAST(round(l_extendedprice * 100) AS BIGINT) AS e,
             |             CAST(round(l_discount * 100) AS BIGINT) AS d,
             |             CAST(round(l_tax * 100) AS BIGINT) AS t
             |           FROM lineitem),
             |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |  CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(e) AS DOUBLE) AS se,
             |  CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(t) AS DOUBLE) AS st,
             |  CAST(sum(CAST(q AS HUGEINT) * q) AS DOUBLE) AS sqq,
             |  CAST(sum(CAST(e AS HUGEINT) * e) AS DOUBLE) AS see,
             |  CAST(sum(CAST(d AS HUGEINT) * d) AS DOUBLE) AS sdd,
             |  CAST(sum(CAST(t AS HUGEINT) * t) AS DOUBLE) AS stt,
             |  CAST(sum(CAST(q AS HUGEINT) * e) AS DOUBLE) AS sqe,
             |  CAST(sum(CAST(q AS HUGEINT) * d) AS DOUBLE) AS sqd,
             |  CAST(sum(CAST(q AS HUGEINT) * t) AS DOUBLE) AS sqt,
             |  CAST(sum(CAST(e AS HUGEINT) * d) AS DOUBLE) AS sed,
             |  CAST(sum(CAST(e AS HUGEINT) * t) AS DOUBLE) AS sett,
             |  CAST(sum(CAST(d AS HUGEINT) * t) AS DOUBLE) AS sdt
             |  FROM v)
             |SELECT col_a, col_b, corr_e6 FROM (
             |  SELECT 'discount' AS col_a, 'tax' AS col_b,
             |    CAST(round((n * sdt - sd * st) / sqrt((n * sdd - sd * sd)
             |      * (n * stt - st * st)) * 1e6) AS BIGINT) AS corr_e6 FROM s
             |  UNION ALL SELECT 'price', 'discount',
             |    CAST(round((n * sed - se * sd) / sqrt((n * see - se * se)
             |      * (n * sdd - sd * sd)) * 1e6) AS BIGINT) FROM s
             |  UNION ALL SELECT 'price', 'tax',
             |    CAST(round((n * sett - se * st) / sqrt((n * see - se * se)
             |      * (n * stt - st * st)) * 1e6) AS BIGINT) FROM s
             |  UNION ALL SELECT 'qty', 'discount',
             |    CAST(round((n * sqd - sq * sd) / sqrt((n * sqq - sq * sq)
             |      * (n * sdd - sd * sd)) * 1e6) AS BIGINT) FROM s
             |  UNION ALL SELECT 'qty', 'price',
             |    CAST(round((n * sqe - sq * se) / sqrt((n * sqq - sq * sq)
             |      * (n * see - se * se)) * 1e6) AS BIGINT) FROM s
             |  UNION ALL SELECT 'qty', 'tax',
             |    CAST(round((n * sqt - sq * st) / sqrt((n * sqq - sq * sq)
             |      * (n * stt - st * st)) * 1e6) AS BIGINT) FROM s)
             |ORDER BY col_a, col_b""".stripMargin),
      (s, d) => {
        def p(a: String, b: String) =
          expr(s"CAST(sum(CAST($a AS DECIMAL(38,0)) * $b) AS DOUBLE)")
        val t = Tables.lineitem(s, d)
          .select(expr("CAST(round(l_quantity * 100) AS BIGINT)").as("q"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("e"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
            expr("CAST(round(l_tax * 100) AS BIGINT)").as("t"))
          .agg(count(lit(1)).cast("double").as("n"),
            sum("q").cast("double").as("sq"), sum("e").cast("double").as("se"),
            sum("d").cast("double").as("sd"), sum("t").cast("double").as("st"),
            p("q", "q").as("sqq"), p("e", "e").as("see"),
            p("d", "d").as("sdd"), p("t", "t").as("stt"),
            p("q", "e").as("sqe"), p("q", "d").as("sqd"),
            p("q", "t").as("sqt"), p("e", "d").as("sed"),
            p("e", "t").as("sett"), p("d", "t").as("sdt"))
        def corr(a: String, b: String, sa: String, sb: String, saa: String,
            sbb: String, sab: String) =
          struct(lit(a).as("col_a"), lit(b).as("col_b"),
            expr(s"""CAST(round((n * $sab - $sa * $sb)
                    | / sqrt((n * $saa - $sa * $sa) * (n * $sbb - $sb * $sb))
                    | * 1e6) AS BIGINT)""".stripMargin).as("corr_e6"))
        t.select(explode(array(
            corr("discount", "tax", "sd", "st", "sdd", "stt", "sdt"),
            corr("price", "discount", "se", "sd", "see", "sdd", "sed"),
            corr("price", "tax", "se", "st", "see", "stt", "sett"),
            corr("qty", "discount", "sq", "sd", "sqq", "sdd", "sqd"),
            corr("qty", "price", "sq", "se", "sqq", "see", "sqe"),
            corr("qty", "tax", "sq", "st", "sqq", "stt", "sqt"))).as("pair"))
          .select(col("pair.*"))
          .orderBy("col_a", "col_b")
      }),

    // inter-purchase intervals: per repeat customer, the count and the
    // min/avg/max spacing of consecutive orders in exact epoch seconds
    // — the recency-cadence feature behind churn and next-order
    // models. One lag window and one groupBy on the SAME key, so the
    // sort and the aggregation share a single customer-hash shuffle.
    Q("analytics_interpurchase",
      Some("""WITH g AS (SELECT o_custkey,
             |             CAST(epoch(o_orderdate) AS BIGINT) AS es,
             |             lag(CAST(epoch(o_orderdate) AS BIGINT))
             |               OVER (PARTITION BY o_custkey
             |                     ORDER BY o_orderdate, o_orderkey) AS prev
             |           FROM orders)
             |SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_gaps,
             |       CAST(round(avg(es - prev)) AS BIGINT) AS avg_gap_s,
             |       CAST(min(es - prev) AS BIGINT) AS min_gap_s,
             |       CAST(max(es - prev) AS BIGINT) AS max_gap_s
             |FROM g WHERE prev IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("es"))
          .withColumn("prev", lag("es", 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy("o_custkey")
          .agg(count(lit(1)).cast("long").as("n_gaps"),
            round(avg(col("es") - col("prev"))).cast("long").as("avg_gap_s"),
            min(col("es") - col("prev")).cast("long").as("min_gap_s"),
            max(col("es") - col("prev")).cast("long").as("max_gap_s"))
          .orderBy("o_custkey")
      }))
}
