package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-31 operator: the k-anonymity audit.
  */
object Extras33 {

  def queries: Seq[Q] = Seq(
    // k-anonymity audit over the (segment, nation) quasi-identifier:
    // equivalence classes smaller than k = 5 re-identify their members
    // and must be suppressed or generalized before release. One
    // aggregation on the quasi-identifier; the report lists violating
    // classes with exact sizes — the privacy gate next to
    // pipeline_pii_mask.
    Q("dq_k_anonymity",
      Some("""SELECT c_mktsegment AS seg, c_nationkey AS nk,
             |       CAST(count(*) AS BIGINT) AS class_size,
             |       CAST(count(*) < 5 AS BOOLEAN) AS violates_k5
             |FROM customer
             |GROUP BY 1, 2 ORDER BY seg, nk""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_mktsegment").as("seg"), col("c_nationkey").as("nk"))
        .agg(count(lit(1)).cast("long").as("class_size"))
        .withColumn("violates_k5", col("class_size") < 5)
        .orderBy("seg", "nk")))
}
