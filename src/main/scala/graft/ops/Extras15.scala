package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-12 operators: an oracle-exact count-min sketch and the
  * multi-aggregate PIVOT clause.
  */
object Extras15 {

  def queries: Seq[Q] = Seq(
    // count-min sketch, fully deterministic: d=4 hash rows × w=16
    // buckets, bucket = first md5 nibble of "key#row" (the same
    // spellable hex-nibble arithmetic as dedup_simhash_md5, so BOTH
    // engines build the identical sketch and the estimates hash-match
    // — the sketch contract est ≥ exact is structural, not sampled).
    // Scale shape: the counter table is d×w cells built by one
    // map-side-combined aggregation over the fact; point queries probe
    // d cells each. The estimate-vs-exact report pins the overcount.
    Q("agg_countmin",
      Some("""WITH ks AS (SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n
             |           FROM events GROUP BY 1),
             |c AS (SELECT r, instr('0123456789abcdef',
             |               substr(md5(event_type || '#' || r), 1, 1)) - 1 AS bk,
             |             CAST(count(*) AS BIGINT) AS cnt
             |      FROM events, range(4) t(r) GROUP BY 1, 2)
             |SELECT ks.event_type, ks.exact_n, CAST(min(c.cnt) AS BIGINT) AS est_n
             |FROM ks CROSS JOIN range(4) t(r)
             |JOIN c ON c.r = t.r
             |      AND c.bk = instr('0123456789abcdef',
             |                   substr(md5(ks.event_type || '#' || t.r), 1, 1)) - 1
             |GROUP BY 1, 2 ORDER BY event_type""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val ks = ev.groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("exact_n"))
        val c = ev.select(col("event_type"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .select(col("r"),
            expr("""instr('0123456789abcdef',
                   | substring(md5(concat(event_type, '#', CAST(r AS STRING))), 1, 1)) - 1"""
              .stripMargin).as("bk"))
          .groupBy("r", "bk").agg(count(lit(1)).cast("long").as("cnt"))
        val probes = ks.select(col("event_type"), col("exact_n"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("bk",
            expr("""instr('0123456789abcdef',
                   | substring(md5(concat(event_type, '#', CAST(r AS STRING))), 1, 1)) - 1"""
              .stripMargin))
        probes.join(broadcast(c), Seq("r", "bk"))
          .groupBy("event_type", "exact_n")
          .agg(min("cnt").cast("long").as("est_n"))
          .orderBy("event_type")
      }),

    // PIVOT with MULTIPLE aggregates per cell (count + exact cent sum
    // per order status): Spark's native clause; the oracle states the
    // same relation as dialect-free conditional aggregation. One
    // partial+final aggregation; the pivot column list is fixed, so
    // the schema is static at plan time.
    Q("sql_pivot_multi",
      Some("""SELECT o_orderpriority,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_n,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |       FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS f_cents,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_n,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |       FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS o_cents,
             |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_n,
             |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |       FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS p_cents
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_orderstatus"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .createOrReplaceTempView("orders_cents")
        s.sql("""SELECT o_orderpriority,
                |       coalesce(F_n, 0)  AS f_n, coalesce(F_cents, 0) AS f_cents,
                |       coalesce(O_n, 0)  AS o_n, coalesce(O_cents, 0) AS o_cents,
                |       coalesce(P_n, 0)  AS p_n, coalesce(P_cents, 0) AS p_cents
                |FROM orders_cents
                |PIVOT (count(*) AS n, sum(cents) AS cents
                |       FOR o_orderstatus IN ('F', 'O', 'P'))
                |ORDER BY o_orderpriority""".stripMargin)
      }))
}
