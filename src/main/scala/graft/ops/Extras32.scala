package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-30 operators: Cohen's d effect size and the ORC sink
  * roundtrip.
  */
object Extras32 {

  def queries: Seq[Q] = Seq(
    // Cohen's d: the standardized effect size that belongs next to
    // every significance test — mean difference over the pooled
    // standard deviation, from the same exact sufficient statistics
    // as the Welch t (2 rows cross the wire, nothing else).
    Q("stat_cohens_d",
      Some("""WITH v AS (SELECT c_mktsegment AS seg,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
             |           FROM customer
             |           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(v) AS BIGINT) AS s,
             |             CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS ssq
             |      FROM v GROUP BY 1)
             |SELECT a.n AS n1, b.n AS n2,
             |       CAST(round((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             |            / sqrt(((a.ssq - CAST(a.s AS DOUBLE) * a.s / a.n)
             |                  + (b.ssq - CAST(b.s AS DOUBLE) * b.s / b.n))
             |                 / (a.n + b.n - 2))
             |            * 1e6) AS BIGINT) AS d_e6
             |FROM (SELECT * FROM g WHERE seg = 'BUILDING') a
             |CROSS JOIN (SELECT * FROM g WHERE seg = 'MACHINERY') b""".stripMargin),
      (s, d) => {
        val g = Tables.customer(s, d)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(col("c_mktsegment").as("seg"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("v"))
          .groupBy("seg")
          .agg(count(lit(1)).cast("long").as("n"),
            sum("v").cast("long").as("s"),
            expr("CAST(sum(CAST(v AS DECIMAL(38,0)) * v) AS DOUBLE)").as("ssq"))
        val a = g.filter(col("seg") === "BUILDING")
          .select(col("n").as("n1"), col("s").as("s1"), col("ssq").as("q1"))
        val b = g.filter(col("seg") === "MACHINERY")
          .select(col("n").as("n2"), col("s").as("s2"), col("ssq").as("q2"))
        a.crossJoin(broadcast(b)).select(col("n1"), col("n2"),
          expr("""CAST(round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                 | / sqrt(((q1 - CAST(s1 AS DOUBLE) * s1 / n1)
                 |       + (q2 - CAST(s2 AS DOUBLE) * s2 / n2))
                 |      / (n1 + n2 - 2))
                 | * 1e6) AS BIGINT)""".stripMargin).as("d_e6"))
      }),

    // ORC sink roundtrip: the columnar-format sibling of sink_parquet
    // (the reader side is already proven by src_orc) — schema and
    // doubles survive bit-for-bit.
    Q("sink_orc",
      Some("SELECT * FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val src = Tables.customer(s, d)
        val out = s"${sys.props("java.io.tmpdir")}/graft_sink_orc_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.write.mode("overwrite").orc(out)
        s.read.schema(src.schema).orc(out).orderBy("c_custkey")
      }))
}
