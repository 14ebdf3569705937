package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-28 operators: the skyline (Pareto-frontier) query, the
  * Mann-Kendall trend test, and multiline-quoted CSV ingestion.
  */
object Extras30 {

  /** Per-user ordered self-pair frame shared by the pairwise trend
    * statistics (Mann-Kendall S here, Theil-Sen slopes in Extras31 —
    * previously two verbatim 15-line scaffolds that had to evolve in
    * lockstep): rank each user's events by (ts, event_id), self-join
    * on the user, keep i_b > i_a. Each (column, name) in `values`
    * surfaces as <name>a / <name>b alongside ia / ib. O(k²) pairs per
    * user, bounded by per-user activity (the documented cost class of
    * both statistics). */
  private[ops] def userPairs(ev: org.apache.spark.sql.DataFrame,
      values: Seq[(org.apache.spark.sql.Column, String)])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = ev.select(col("user_id") +:
      (values.map { case (c, n) => c.as(n) } :+
        row_number().over(Window.partitionBy("user_id")
          .orderBy("ts", "event_id")).cast("long").as("i")): _*)
    val names = values.map(_._2) :+ "i"
    val a = v.select(col("user_id") +: names.map(n => col(n).as(s"${n}a")): _*)
    val b = v.select(col("user_id") +: names.map(n => col(n).as(s"${n}b")): _*)
    a.join(b, Seq("user_id")).filter(col("ib") > col("ia"))
  }

  def queries: Seq[Q] = Seq(
    // skyline: customers not DOMINATED on (total spend ↑, order count
    // ↑) — dominated means someone spends at least as much AND orders
    // at least as often, strictly better on one axis. The classic
    // multi-objective frontier, evaluated on the REDUCED per-customer
    // aggregate, GRID-PRUNED before the quadratic part (r9): spend is
    // coarsened into ≤256 ranges, each range's max order-count rolls
    // into a strictly-higher-range prefix max (a ≤256-row window —
    // bounded, never a global data window), and a point whose
    // n_orders ≤ that prefix max is PROVABLY dominated (some point
    // with strictly greater spend has ≥ its orders) and dropped
    // before pairing. Dominators of survivors are themselves
    // survivors (same-range dominator inherits the same prefix max;
    // higher-range dominator would have pruned the point), so the
    // exact dominance anti-join over the surviving near-frontier band
    // — typically ~frontier-sized; worst case (fully anti-correlated
    // data) degenerates to the full set, the skyline's inherent worst
    // case — is result-identical to the naive all-pairs spelling.
    // Pinned broadcasts only on the fixed-cardinality sides (1-row
    // range, ≤256-row prefix table). The dominance anti-join itself
    // has NO equi keys, and Spark's only physical strategy for a
    // non-equi LEFT ANTI join is BroadcastNestedLoopJoin building the
    // right side — so the band is broadcast REGARDLESS of hints or
    // stats; dropping the former broadcast() pin removes the explicit
    // endorsement, not the behavior. The actual 100 TB safety valve is
    // the grid pruning above it: the broadcast side is the
    // NEAR-FRONTIER band, typically ~frontier-sized, degenerating to
    // the full per-customer aggregate only on fully anti-correlated
    // data — the skyline's inherent worst case, where every algorithm
    // returns (and must somewhere hold) the whole set.
    Q("analytics_skyline",
      Some("""WITH a AS (SELECT o_custkey AS ck,
             |             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend,
             |             CAST(count(*) AS BIGINT) AS n_orders
             |           FROM orders GROUP BY 1)
             |SELECT ck, spend, n_orders FROM a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM a b
             |  WHERE b.spend >= a.spend AND b.n_orders >= a.n_orders
             |    AND (b.spend > a.spend OR b.n_orders > a.n_orders))
             |ORDER BY ck""".stripMargin),
      (s, d) => {
        val a = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long").as("spend"),
            count(lit(1)).cast("long").as("n_orders"))
        val rng = a.agg(min("spend").as("mn"), max("spend").as("mx"))
        val ab = a.crossJoin(broadcast(rng))
          .withColumn("bk", ((col("spend") - col("mn")) * 256L /
            (col("mx") - col("mn") + 1)).cast("long"))
        val pref = ab.groupBy("bk").agg(max("n_orders").as("bm"))
          .withColumn("pmh", max(col("bm")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("bk").desc)
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
          .select("bk", "pmh")
        val cand = ab.join(broadcast(pref), Seq("bk"), "left")
          .filter(col("pmh").isNull || col("n_orders") > col("pmh"))
          .select("ck", "spend", "n_orders")
        val b = cand.select(col("spend").as("b_spend"),
          col("n_orders").as("b_orders"))
        cand.join(b,
            col("b_spend") >= col("spend") && col("b_orders") >= col("n_orders")
              && (col("b_spend") > col("spend") || col("b_orders") > col("n_orders")),
            "left_anti")
          .orderBy("ck")
      }),

    // Mann-Kendall trend test per user: S = Σ sign(vⱼ − vᵢ) over all
    // i<j pairs of the time-ordered series — the nonparametric
    // monotone-trend statistic, an exact integer by construction. The
    // pairwise join is keyed on the user and bounded by per-series
    // length squared (never the table), the documented cost class of
    // the test.
    Q("stat_mann_kendall",
      Some("""WITH v AS (SELECT user_id, ts, event_id,
             |             CAST(round(value * 100) AS BIGINT) AS c,
             |             row_number() OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS i
             |           FROM events)
             |SELECT a.user_id, CAST(max(a.i) AS BIGINT) AS n_i,
             |       CAST(sum(CASE WHEN b.c > a.c THEN 1
             |                     WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
             |       CAST(CASE WHEN sum(CASE WHEN b.c > a.c THEN 1
             |                              WHEN b.c < a.c THEN -1 ELSE 0 END) > 0
             |                 THEN 'up'
             |                 WHEN sum(CASE WHEN b.c > a.c THEN 1
             |                              WHEN b.c < a.c THEN -1 ELSE 0 END) < 0
             |                 THEN 'down' ELSE 'flat' END AS VARCHAR) AS trend
             |FROM v a JOIN v b ON a.user_id = b.user_id AND b.i > a.i
             |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin),
      (s, d) => {
        userPairs(Tables.events(s, d),
          Seq(expr("CAST(round(value * 100) AS BIGINT)") -> "c"))
          .groupBy("user_id")
          .agg(max("ia").cast("long").as("n_i"),
            sum(when(col("cb") > col("ca"), 1)
              .when(col("cb") < col("ca"), -1).otherwise(0))
              .cast("long").as("s_stat"))
          .withColumn("trend",
            when(col("s_stat") > 0, "up")
              .when(col("s_stat") < 0, "down").otherwise("flat"))
          .orderBy("user_id")
      }),

    // multiline-quoted CSV: fields containing embedded newlines
    // roundtrip through a quoted write and a multiLine read — the CSV
    // edge every hand-rolled splitter breaks on (and why multiLine
    // files are NOT byte-range splittable; at scale land them as
    // parquet instead).
    Q("src_csv_multiline",
      Some("""SELECT c_custkey, c_name || chr(10) || c_mktsegment AS note
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val src = Tables.customer(s, d)
          .select(col("c_custkey"),
            concat(col("c_name"), lit("\n"), col("c_mktsegment")).as("note"))
        val out = s"${sys.props("java.io.tmpdir")}/graft_src_csv_ml_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(src.schema)
          .option("header", "true").option("multiLine", "true")
          .csv(out)
          .orderBy("c_custkey")
      }))
}
