package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-14 operators: Kolmogorov-Smirnov two-sample distance,
  * Spearman rank correlation, and moving-average crossover signals —
  * every statistic reaches its closed form through exact integers
  * (cross-multiplied comparisons, doubled ranks), never a float
  * accumulation.
  */
object Extras17 {

  def queries: Seq[Q] = Seq(
    // two-sample Kolmogorov-Smirnov distance between BUILDING and
    // MACHINERY balance distributions: D = max |F₁ − F₂| evaluated at
    // every distinct pooled value (CDF steps only move there — the
    // textbook evaluation points). |cum₁·n₂ − cum₂·n₁| is an exact
    // integer (cross-multiplication instead of float CDFs), so the
    // max is exact and only the final division is a double. Scale
    // shape: the engine reduces rows to one per distinct value first,
    // then takes BOTH cumulative counts from ScaleRank's range-
    // partitioned prefix sums in one window pass — no per-row global
    // sort at any size.
    Q("stat_ks_test",
      Some("""WITH v AS (SELECT c_mktsegment AS seg,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
             |           FROM customer
             |           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |n AS (SELECT CAST(count(*) FILTER (WHERE seg = 'BUILDING') AS BIGINT) AS n1,
             |             CAST(count(*) FILTER (WHERE seg = 'MACHINERY') AS BIGINT) AS n2
             |      FROM v),
             |pv AS (SELECT v,
             |         CAST(count(*) FILTER (WHERE seg = 'BUILDING') AS BIGINT) AS d1,
             |         CAST(count(*) FILTER (WHERE seg = 'MACHINERY') AS BIGINT) AS d2
             |       FROM v GROUP BY 1),
             |c AS (SELECT v,
             |        CAST(sum(d1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
             |        CAST(sum(d2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
             |      FROM pv),
             |m AS (SELECT CAST(max(abs(c1 * n.n2 - c2 * n.n1)) AS BIGINT) AS dnum
             |      FROM c CROSS JOIN n)
             |SELECT n.n1, n.n2, m.dnum,
             |       CAST(round(CAST(m.dnum AS DOUBLE) / (n.n1 * n.n2) * 1e6) AS BIGINT) AS d_e6
             |FROM m CROSS JOIN n""".stripMargin),
      (s, d) => {
        val v = Tables.customer(s, d)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("seg"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("v"))
        val n = v.agg(
          count(when(col("seg") === "BUILDING", 1)).cast("long").as("n1"),
          count(when(col("seg") === "MACHINERY", 1)).cast("long").as("n2"))
        val pv = v.groupBy("v").agg(
          count(when(col("seg") === "BUILDING", 1)).cast("long").as("d1"),
          count(when(col("seg") === "MACHINERY", 1)).cast("long").as("d2"))
        val c = ScaleRank.withGlobalRanks(pv, "v", "v",
          runOns = Seq("d1" -> "c1", "d2" -> "c2"))
        val m = c.crossJoin(broadcast(n))
          .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
            .cast("long").as("dnum"))
        m.crossJoin(broadcast(n)).select(col("n1"), col("n2"), col("dnum"),
          expr("CAST(round(CAST(dnum AS DOUBLE) / (n1 * n2) * 1e6) AS BIGINT)")
            .as("d_e6"))
      }),

    // Spearman rank correlation between quantity and price per return
    // flag: Pearson over tie-averaged ranks carried as DOUBLED
    // integers (2·rank + ties − 1), so the rank power sums stay exact
    // BIGINTs — the doubling cancels in the correlation. Ranks are
    // within-group (window per flag); one closed-form r per group.
    Q("stat_spearman",
      Some("""WITH v AS (SELECT l_returnflag AS rf,
             |             CAST(l_quantity AS BIGINT) AS x,
             |             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
             |           FROM lineitem),
             |r AS (SELECT rf,
             |        CAST(2 * rank() OVER (PARTITION BY rf ORDER BY x)
             |             + count(*) OVER (PARTITION BY rf, x) - 1 AS BIGINT) AS rx,
             |        CAST(2 * rank() OVER (PARTITION BY rf ORDER BY y)
             |             + count(*) OVER (PARTITION BY rf, y) - 1 AS BIGINT) AS ry
             |      FROM v),
             |g AS (SELECT rf, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
             |        CAST(sum(CAST(rx AS HUGEINT) * ry) AS DOUBLE) AS sxy,
             |        CAST(sum(CAST(rx AS HUGEINT) * rx) AS DOUBLE) AS sxx,
             |        CAST(sum(CAST(ry AS HUGEINT) * ry) AS DOUBLE) AS syy
             |      FROM r GROUP BY 1)
             |SELECT rf, n,
             |       CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |                 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             |            * 1e6) AS BIGINT) AS rho_e6
             |FROM g ORDER BY rf""".stripMargin),
      (s, d) => {
        // r16 (guide §2.5): the window spelling partitioned BOTH rank
        // passes by l_returnflag — 3 distinct values, so two full-fact
        // sorts each ran on 3 tasks (the single-partition-sort shape
        // ScaleRank exists to kill; measured ~4.8 s serial at sf0.1).
        // The doubled tie-averaged rank of a row is a function of its
        // (rf, value) GROUP alone: with d = rows at the value and
        // c = inclusive running count of rf-rows ≤ value (value-
        // ascending), rank = c − d + 1 and 2·rank + d − 1 = 2c − d + 1.
        // So the ranks come from the per-(rf, value) marginals — the
        // y marginal's running count via partitionedRunningSum (two-
        // level, #rf × #buckets parallel), the ≤ |rf|·50-row x
        // marginal broadcast — and only sxy (the one cross-moment)
        // joins back to the fact, on the high-cardinality (rf, y) key.
        // Every sum is the same integers added in a different order
        // (exact in DECIMAL(38,0) / wrap-associative in BIGINT), so
        // the closed form is bit-identical to the window spelling.
        val v = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("rf"),
            expr("CAST(l_quantity AS BIGINT)").as("x"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("y"))
          .localCheckpoint(false)
        def marginal(cn: String) = ScaleRank.partitionedRunningSum(
            v.groupBy(col("rf"), col(cn)).agg(count(lit(1)).as("d")),
            "rf", Seq(cn), "d", floor(col(cn) / 65536L), "c")
          .select(col("rf"), col(cn),
            (lit(2L) * col("c") - col("d") + 1L).as(s"r$cn"), col("d"))
        val xr = marginal("x")
        val yr = marginal("y")
        def mom(src: DataFrame, rc: String) = src.groupBy("rf")
          .agg(sum(col("d") * col(rc)).cast("long").as(s"s$rc"),
            expr(s"CAST(sum(CAST(d AS DECIMAL(38,0)) * $rc * $rc) AS DOUBLE)")
              .as(s"s$rc$rc"))
        val sxy = v
          .join(yr.select("rf", "y", "ry"), Seq("rf", "y"))
          .join(broadcast(xr.select("rf", "x", "rx")), Seq("rf", "x"))
          .groupBy("rf")
          .agg(count(lit(1)).cast("long").as("n"),
            expr("CAST(sum(CAST(rx AS DECIMAL(38,0)) * ry) AS DOUBLE)").as("sxy"))
        sxy.join(mom(xr, "rx"), Seq("rf")).join(mom(yr, "ry"), Seq("rf"))
          .select(col("rf"), col("n"), col("srx").as("sx"),
            col("sry").as("sy"), col("sxy"),
            col("srxrx").as("sxx"), col("sryry").as("syy"))
          .select(col("rf"), col("n"),
            expr("""CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   | / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   | * 1e6) AS BIGINT)""".stripMargin).as("rho_e6"))
          .orderBy("rf")
      }),

    // moving-average crossover (the golden-cross signal): per customer,
    // trailing-3 vs trailing-8 order-cents means compared WITHOUT
    // rounding — sum₃·n₈ > sum₈·n₃ cross-multiplies to an exact integer
    // comparison, so the above/below state and its flip points are
    // exact. One window shuffle carries both frames and the lag.
    Q("ts_sma_crossover",
      Some("""WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok, o_orderdate AS dt,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS p
             |           FROM orders),
             |f AS (SELECT ck, ok, dt,
             |        CAST(sum(p) OVER (PARTITION BY ck ORDER BY dt, ok
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS s3,
             |        CAST(count(*) OVER (PARTITION BY ck ORDER BY dt, ok
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n3,
             |        CAST(sum(p) OVER (PARTITION BY ck ORDER BY dt, ok
             |             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS s8,
             |        CAST(count(*) OVER (PARTITION BY ck ORDER BY dt, ok
             |             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS n8
             |      FROM o),
             |s AS (SELECT ck, ok, dt,
             |        CASE WHEN s3 * n8 > s8 * n3 THEN 1 ELSE 0 END AS above
             |      FROM f)
             |SELECT ck, ok, CAST(above AS BIGINT) AS above,
             |       CAST(CASE WHEN lag(above) OVER (PARTITION BY ck ORDER BY dt, ok)
             |                      IS NOT NULL
             |                  AND above <> lag(above) OVER (PARTITION BY ck ORDER BY dt, ok)
             |             THEN 1 ELSE 0 END AS BIGINT) AS crossover
             |FROM s ORDER BY ck, ok""".stripMargin),
      (s, d) => {
        val base = Window.partitionBy("ck").orderBy("dt", "ok")
        val w3 = base.rowsBetween(-2, 0)
        val w8 = base.rowsBetween(-7, 0)
        val f = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
            col("o_orderdate").as("dt"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("p"))
          .withColumn("s3", sum("p").over(w3).cast("long"))
          .withColumn("n3", count(lit(1)).over(w3).cast("long"))
          .withColumn("s8", sum("p").over(w8).cast("long"))
          .withColumn("n8", count(lit(1)).over(w8).cast("long"))
          .withColumn("above",
            when(col("s3") * col("n8") > col("s8") * col("n3"), 1).otherwise(0))
        f.withColumn("prev", lag("above", 1).over(base))
          .select(col("ck"), col("ok"), col("above").cast("long").as("above"),
            when(col("prev").isNotNull && col("above") =!= col("prev"), 1)
              .otherwise(0).cast("long").as("crossover"))
          .orderBy("ck", "ok")
      }))
}
