package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-24 operators: value-replacement cleaning and
  * deterministic weighted sampling.
  */
object Extras26 {

  def queries: Seq[Q] = Seq(
    // DataFrameNaFunctions.replace: dictionary-driven value
    // normalization (the "fix the legacy codes" cleaning step) — a
    // distinct API surface from na.fill/na.drop. Map-side CASE under
    // the hood; the oracle states the CASE explicitly.
    Q("replace_funcs",
      Some("""SELECT c_custkey,
             |       CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'AUTO'
             |                         WHEN 'MACHINERY' THEN 'MACH'
             |                         ELSE c_mktsegment END AS seg,
             |       CASE WHEN c_nationkey = 0 THEN 99
             |            ELSE c_nationkey END AS nk
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .na.replace("c_mktsegment",
          Map("AUTOMOBILE" -> "AUTO", "MACHINERY" -> "MACH"))
        .na.replace("c_nationkey", Map(0 -> 99))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("c_nationkey").as("nk"))
        .orderBy("c_custkey")),

    // weighted sampling without replacement (Efraimidis-Spirakis
    // A-Res), fully deterministic: the per-row uniform comes from an
    // md5 nibble pair (u ∈ (0,1], identical in both engines), the
    // weight is the order's cent value, and the k rows with the
    // largest ln(u)/w keys win. The ranking key is one closed-form
    // double over exact integers, so the selected ID SET hash-matches
    // — "random" sampling with a reproducibility proof. At scale this
    // is TakeOrderedAndProject on the key, no global sort.
    Q("sample_weighted",
      Some("""WITH w AS (SELECT o_orderkey,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS wt,
             |             CAST(instr('0123456789abcdef',
             |                    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) AS BIGINT) * 16
             |             + CAST(instr('0123456789abcdef',
             |                    substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) AS BIGINT)
             |               AS u272
             |           FROM orders),
             |k AS (SELECT o_orderkey, wt,
             |        CAST(round(ln(CAST(u272 AS DOUBLE) / 272) / wt * 1e12) AS BIGINT) AS akey12
             |      FROM w)
             |SELECT o_orderkey, wt FROM k
             |ORDER BY akey12 DESC, o_orderkey LIMIT 50""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("wt"),
          expr("""CAST(instr('0123456789abcdef',
                 |  substring(md5(CAST(o_orderkey AS STRING)), 1, 1)) AS BIGINT) * 16
                 |+ CAST(instr('0123456789abcdef',
                 |  substring(md5(CAST(o_orderkey AS STRING)), 2, 1)) AS BIGINT)"""
            .stripMargin).as("u272"))
        // the A-Res key is mu-rounded to a 1e-12 grid before it becomes
        // the cross-engine sort key (repo float policy): a raw libm ln()
        // differs by an ulp between JVM and DuckDB, enough to flip two
        // near-equal keys at the rank-50 boundary and diverge the
        // hash-gated sample set
        .withColumn("akey12",
          expr("CAST(round(ln(CAST(u272 AS DOUBLE) / 272) / wt * 1e12) AS BIGINT)"))
        .orderBy(col("akey12").desc, col("o_orderkey"))
        .limit(50)
        .select("o_orderkey", "wt")))
}
