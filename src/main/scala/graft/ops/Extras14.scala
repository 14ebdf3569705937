package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-11 operators: referential-integrity conformance,
  * embedding scalar quantization, multi-measure UNPIVOT, and
  * new-vs-returning user classification.
  */
object Extras14 {

  def queries: Seq[Q] = Seq(
    // referential-integrity report: one row per declared relationship
    // with exact total/orphan counts — the strict FK (orders→customer,
    // clean by construction) next to a business contract
    // (orders→ACTIVE customer, which fires on non-positive balances).
    // Each check is one left anti-ish aggregation with the dim side
    // reduced to its key set and broadcast; the fact never shuffles.
    Q("dq_referential",
      Some("""WITH ck AS (SELECT c_custkey FROM customer),
             |ak AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
             |SELECT 'orders->customer' AS relationship,
             |       CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT) AS n_orphans
             |FROM orders LEFT JOIN ck ON o_custkey = c_custkey
             |UNION ALL
             |SELECT 'orders->active_customer',
             |       CAST(count(*) AS BIGINT),
             |       CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
             |FROM orders LEFT JOIN ak ON o_custkey = c_custkey
             |ORDER BY relationship""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
        val ck = Tables.customer(s, d).select("c_custkey")
        val ak = Tables.customer(s, d)
          .filter(col("c_acctbal") > 0).select("c_custkey")
        def check(name: String, dim: org.apache.spark.sql.DataFrame) =
          // customer keys SCALE with the corpus — unhinted (r9 policy)
          o.join(dim, col("o_custkey") === col("c_custkey"), "left")
            .agg(count(lit(1)).cast("long").as("n_rows"),
              count(when(col("c_custkey").isNull, 1)).cast("long").as("n_orphans"))
            .select(lit(name).as("relationship"), col("n_rows"), col("n_orphans"))
        check("orders->customer", ck)
          .unionAll(check("orders->active_customer", ak))
          .orderBy("relationship")
      }),

    // scalar quantization of embeddings (int8-style codes): per-dim
    // min/max over the corpus (exact selection aggregates — no float
    // accumulation) broadcast back; code = round((v-min)/(max-min)·255)
    // per element, one identical closed-form fold in both engines. The
    // memory-compression step every billion-vector ANN index runs;
    // first 4 dims reported.
    Q("emb_quantize",
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |b AS (SELECT min(v[1]) AS mn1, max(v[1]) AS mx1,
             |             min(v[2]) AS mn2, max(v[2]) AS mx2,
             |             min(v[3]) AS mn3, max(v[3]) AS mx3,
             |             min(v[4]) AS mn4, max(v[4]) AS mx4 FROM e)
             |SELECT vec_id,
             |       CAST(round((v[1] - mn1) / (mx1 - mn1) * 255) AS BIGINT) AS c1,
             |       CAST(round((v[2] - mn2) / (mx2 - mn2) * 255) AS BIGINT) AS c2,
             |       CAST(round((v[3] - mn3) / (mx3 - mn3) * 255) AS BIGINT) AS c3,
             |       CAST(round((v[4] - mn4) / (mx4 - mn4) * 255) AS BIGINT) AS c4
             |FROM e CROSS JOIN b ORDER BY vec_id""".stripMargin),
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        val b = e.agg(
          min(element_at(col("v"), 1)).as("mn1"), max(element_at(col("v"), 1)).as("mx1"),
          min(element_at(col("v"), 2)).as("mn2"), max(element_at(col("v"), 2)).as("mx2"),
          min(element_at(col("v"), 3)).as("mn3"), max(element_at(col("v"), 3)).as("mx3"),
          min(element_at(col("v"), 4)).as("mn4"), max(element_at(col("v"), 4)).as("mx4"))
        e.crossJoin(broadcast(b)).select(col("vec_id"),
          expr("CAST(round((v[0] - mn1) / (mx1 - mn1) * 255) AS BIGINT)").as("c1"),
          expr("CAST(round((v[1] - mn2) / (mx2 - mn2) * 255) AS BIGINT)").as("c2"),
          expr("CAST(round((v[2] - mn3) / (mx3 - mn3) * 255) AS BIGINT)").as("c3"),
          expr("CAST(round((v[3] - mn4) / (mx4 - mn4) * 255) AS BIGINT)").as("c4"))
          .orderBy("vec_id")
      }),

    // multi-measure UNPIVOT: two (value, value) measure groups fold to
    // rows in one pass — Spark's native UNPIVOT clause; the oracle
    // states the same relation as UNION ALL (the dialect-free
    // formulation). Map-side only; output exact cents/µ-ints.
    Q("sql_unpivot_multi",
      Some("""SELECT l_orderkey, l_linenumber, 'qty_price' AS grp,
             |       CAST(round(l_quantity * 100) AS BIGINT) AS v1_e2,
             |       CAST(round(l_extendedprice * 100) AS BIGINT) AS v2_e2
             |FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'disc_tax',
             |       CAST(round(l_discount * 100) AS BIGINT),
             |       CAST(round(l_tax * 100) AS BIGINT)
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, grp""".stripMargin),
      (s, d) => {
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("CAST(round(l_quantity * 100) AS BIGINT)").as("q"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ep"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("dc"),
            expr("CAST(round(l_tax * 100) AS BIGINT)").as("tx"))
          .createOrReplaceTempView("li_cents")
        s.sql("""SELECT l_orderkey, l_linenumber, grp, v1_e2, v2_e2
                |FROM li_cents
                |UNPIVOT INCLUDE NULLS ((v1_e2, v2_e2) FOR grp IN ((q, ep) AS qty_price,
                |                                    (dc, tx) AS disc_tax))
                |ORDER BY l_orderkey, l_linenumber, grp""".stripMargin)
      }),

    // new vs returning users per week: a user's events classify by
    // whether the week is their first-ever. The distinct (user, week)
    // activity set reduces first; the per-user first week is one more
    // reduction of THAT set, joined back on the co-partitioned key.
    Q("analytics_new_returning",
      Some("""WITH a AS (SELECT DISTINCT user_id,
             |             CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
             |           FROM events),
             |f AS (SELECT user_id, min(wk) AS first_wk FROM a GROUP BY 1)
             |SELECT a.wk,
             |       CAST(count(*) FILTER (WHERE a.wk = f.first_wk) AS BIGINT) AS new_users,
             |       CAST(count(*) FILTER (WHERE a.wk > f.first_wk) AS BIGINT) AS returning_users
             |FROM a JOIN f USING (user_id)
             |GROUP BY a.wk ORDER BY a.wk""".stripMargin),
      (s, d) => {
        val a = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val f = a.groupBy("user_id").agg(min("wk").as("first_wk"))
        a.join(f, "user_id")
          .groupBy("wk")
          .agg(count(when(col("wk") === col("first_wk"), 1)).cast("long")
            .as("new_users"),
            count(when(col("wk") > col("first_wk"), 1)).cast("long")
              .as("returning_users"))
          .orderBy("wk")
      }))
}
