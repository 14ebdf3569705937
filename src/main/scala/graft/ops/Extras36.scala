package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-34 operator: the sequence-gap audit.
  */
object Extras36 {

  def queries: Seq[Q] = Seq(
    // sequence-gap audit: contiguous missing-ID ranges within the
    // fulfilled-order key sequence (a partition of a dense global
    // sequence has holes by construction — exactly how real feed
    // audits look: "which invoice numbers never arrived?"). Scale
    // shape: NO global-sort window over the fact. Keys bucket by
    // floor(id/65536); lag runs per-bucket (partitioned window), and
    // the bucket-boundary pairs come from a lag over the tiny
    // per-bucket (min,max) aggregate — one row per non-empty bucket,
    // bounded by id_range/65536 regardless of fact size. Every
    // consecutive-id pair is either intra-bucket or a (prev-bucket
    // max, next-bucket min) pair, so the union is exactly the global
    // lag's gap set. Total missing reconciles with max−min+1−count.
    Q("dq_id_gaps",
      Some("""WITH k AS (SELECT o_orderkey AS id,
             |             lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev
             |           FROM orders WHERE o_orderstatus = 'F')
             |SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
             |       CAST(id - 1 AS BIGINT) AS gap_end,
             |       CAST(id - prev - 1 AS BIGINT) AS n_missing
             |FROM k WHERE prev IS NOT NULL AND id - prev > 1
             |ORDER BY gap_start""".stripMargin),
      (s, d) => {
        val ids = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("id"))
          .withColumn("bkt", floor(col("id") / 65536L))
        val wIn = Window.partitionBy("bkt").orderBy("id")
        val inner = ids
          .withColumn("prev", lag("id", 1).over(wIn))
          .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
          .select(col("prev"), col("id"))
        val perBucket = ids.groupBy("bkt")
          .agg(min("id").as("mn"), max("id").as("mx"))
        // boundary gaps BETWEEN buckets, themselves two-leveled: the
        // bucket table is max_id/2^16 rows (scales with the id domain
        // — an unpartitioned lag over it is the single-task sort this
        // query exists to avoid), so lag within super-buckets of 2^16
        // buckets and stitch super-boundaries with a window over the
        // ≤ max_id/2^32-row super table (≈ 232 rows at 1e12 ids)
        val pb = perBucket.withColumn("sb", floor(col("bkt") / 65536L))
        val wS = Window.partitionBy("sb").orderBy("bkt")
        val innerB = pb
          .withColumn("prev", lag("mx", 1).over(wS))
          .filter(col("prev").isNotNull && col("mn") - col("prev") > 1)
          .select(col("prev"), col("mn").as("id"))
        val perSuper = pb.groupBy("sb")
          .agg(min(struct(col("bkt"), col("mn"))).getField("mn").as("smn"),
            max(struct(col("bkt"), col("mx"))).getField("mx").as("smx"))
        val wSS = Window.orderBy("sb") // ≤ max_id/2^32 rows — truly tiny
        val boundaryS = perSuper
          .withColumn("prev", lag("smx", 1).over(wSS))
          .filter(col("prev").isNotNull && col("smn") - col("prev") > 1)
          .select(col("prev"), col("smn").as("id"))
        inner.unionByName(innerB).unionByName(boundaryS)
          .select((col("prev") + 1).cast("long").as("gap_start"),
            (col("id") - 1).cast("long").as("gap_end"),
            (col("id") - col("prev") - 1).cast("long").as("n_missing"))
          .orderBy("gap_start")
      }))
}
