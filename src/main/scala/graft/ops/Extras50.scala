package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 wave-50 operators: interval algebra — max-overlap sweep and
  * interval merge (gaps-and-islands with END dates).
  */
object Extras50 {

  def queries: Seq[Q] = Seq(
    // max concurrent shipments per part: the classic sweep-line over
    // [shipdate, shipdate + transit] intervals (transit synthesized
    // deterministically from the line keys — the testdata carries no
    // receipt date; the interval algebra is the operator under test)
    // — +1 at start, −1 the day
    // after end, deltas pre-aggregated per (part, day) so tie order
    // cannot matter, then one running sum per part. Capacity planning
    // ("how many of this part are in transit at once") and the depth
    // companion to interval merge. Scale: everything partitions on
    // the part key; the running sum rides the per-part day grid,
    // bounded by the date span.
    Q("ts_max_concurrent",
      Some("""WITH iv AS (SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS s,
             |             CAST(l_shipdate AS DATE)
             |               + CAST((l_orderkey * 7 + l_linenumber) % 25 + 1
             |                      AS INTEGER) AS e
             |           FROM lineitem),
             |ev AS (SELECT pk, s AS d, CAST(1 AS BIGINT) AS delta FROM iv
             |       UNION ALL
             |       SELECT pk, e + 1, CAST(-1 AS BIGINT) FROM iv),
             |c AS (SELECT pk, d, CAST(sum(delta) AS BIGINT) AS dd
             |      FROM ev GROUP BY 1, 2),
             |r AS (SELECT pk,
             |        sum(dd) OVER (PARTITION BY pk ORDER BY d
             |                      ROWS UNBOUNDED PRECEDING) AS active
             |      FROM c)
             |SELECT pk AS l_partkey, CAST(max(active) AS BIGINT) AS max_concurrent
             |FROM r GROUP BY 1 ORDER BY l_partkey""".stripMargin),
      (s, d) => {
        val iv = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"),
            to_date(col("l_shipdate")).as("st"),
            date_add(to_date(col("l_shipdate")),
              ((col("l_orderkey").cast("long") * 7 + col("l_linenumber")) % 25
                + 1).cast("int")).as("e"))
        val ev = iv.select(col("pk"), col("st").as("d"), lit(1L).as("delta"))
          .unionByName(iv.select(col("pk"), date_add(col("e"), 1).as("d"),
            lit(-1L).as("delta")))
        val c = ev.groupBy("pk", "d").agg(sum("delta").cast("long").as("dd"))
        val w = Window.partitionBy("pk").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c.withColumn("active", sum(col("dd")).over(w))
          .groupBy(col("pk").as("l_partkey"))
          .agg(max(col("active")).cast("long").as("max_concurrent"))
          .orderBy("l_partkey")
      }),

    // interval merge per supplier: overlapping/touching transit
    // windows (same synthesized [ship, ship + transit] intervals as
    // the sweep above) coalesce into islands (intervals can NEST, so this is
    // running-max sweep territory, not plain gaps-and-islands on
    // start dates): a new island begins where the start clears the
    // running max of all prior ends. Reports islands and exact covered
    // days — the "when was this supplier shipping at all" timeline.
    // Tie-permutation safe: island membership depends only on values,
    // and the output aggregates per supplier. One partitioned window
    // chain sharing a single (supplier) shuffle.
    Q("ts_interval_merge",
      Some("""WITH iv AS (SELECT l_suppkey AS sk, CAST(l_shipdate AS DATE) AS s,
             |             CAST(l_shipdate AS DATE)
             |               + CAST((l_orderkey * 7 + l_linenumber) % 25 + 1
             |                      AS INTEGER) AS e
             |           FROM lineitem),
             |o AS (SELECT sk, s, e,
             |        max(e) OVER (PARTITION BY sk ORDER BY s, e
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |      FROM iv),
             |f AS (SELECT sk, s, e,
             |        CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
             |      FROM o),
             |i AS (SELECT sk, s, e,
             |        sum(ni) OVER (PARTITION BY sk ORDER BY s, e
             |                      ROWS UNBOUNDED PRECEDING) AS island
             |      FROM f),
             |g AS (SELECT sk, island, min(s) AS is_, max(e) AS ie
             |      FROM i GROUP BY 1, 2)
             |SELECT sk AS l_suppkey, CAST(count(*) AS BIGINT) AS n_islands,
             |       CAST(sum(date_diff('day', is_, ie) + 1) AS BIGINT)
             |         AS covered_days
             |FROM g GROUP BY 1 ORDER BY l_suppkey""".stripMargin),
      (s, d) => {
        val iv = Tables.lineitem(s, d)
          .select(col("l_suppkey").as("sk"),
            to_date(col("l_shipdate")).as("st"),
            date_add(to_date(col("l_shipdate")),
              ((col("l_orderkey").cast("long") * 7 + col("l_linenumber")) % 25
                + 1).cast("int")).as("e"))
        val wPrev = Window.partitionBy("sk").orderBy("st", "e")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wRun = Window.partitionBy("sk").orderBy("st", "e")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        iv.withColumn("pm", max(col("e")).over(wPrev))
          .withColumn("ni",
            when(col("pm").isNull || col("st") > col("pm"), 1).otherwise(0))
          .withColumn("island", sum(col("ni")).over(wRun))
          .groupBy("sk", "island")
          .agg(min(col("st")).as("is_"), max(col("e")).as("ie"))
          .groupBy(col("sk").as("l_suppkey"))
          .agg(count(lit(1)).cast("long").as("n_islands"),
            sum(datediff(col("ie"), col("is_")) + 1).cast("long")
              .as("covered_days"))
          .orderBy("l_suppkey")
      }))
}
