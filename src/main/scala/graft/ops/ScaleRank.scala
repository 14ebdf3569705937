package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact global ranking.
  *
  * `ntile` / `row_number` / running sums over an unpartitioned Window
  * are single-partition sorts — the one shape that cannot survive a
  * 100× scale-up. This helper computes the SAME exact numbers with a
  * two-phase range-partitioned plan:
  *
  *   1. approx_percentile sketches ~`nRanges` metric cutpoints (one
  *      mergeable partial-agg pass; the cutpoints need NOT be exact —
  *      any metric-monotone bucketing preserves exact ranks, the
  *      sketch only balances the ranges);
  *   2. each row maps to a range by comparing against the broadcast
  *      cutpoint array (map-side, codegen'd);
  *   3. per-range counts/sums (≤ nRanges rows) prefix-sum on a tiny
  *      window and broadcast back as offsets;
  *   4. row_number / running sum run under a Window PARTITIONED by
  *      range, plus the broadcast offset.
  *
  * Rows with equal metric values always share a range (assignment
  * depends only on the metric), so the within-range (metric, key)
  * order is exactly the global order restricted to the range — ranks
  * and running sums match the global-sort spelling bit-for-bit, while
  * the largest sort is ~1/nRanges of the data (skew bounded by the
  * largest tie mass, as with any range partitioner).
  */
object ScaleRank {

  /** Adds exact global row numbers (and optionally the running sum of
    * `runOn`) over ORDER BY metric asc|desc, key ASC — without a
    * single-partition sort. When `nName` is set, a column with the
    * total row count is also attached (for ntileFromRank).
    */
  def withGlobalRank(df: DataFrame, metric: String, key: String,
      descending: Boolean = false, nRanges: Int = 32,
      rkName: String = "rk",
      runOn: Option[String] = None, runName: String = "run",
      nName: Option[String] = None): DataFrame =
    withGlobalRanks(df, metric, key, descending, nRanges, rkName,
      runOn.map(c => c -> runName).toSeq, nName)

  /** As [[withGlobalRank]], but carrying any number of running sums in
    * the same single partitioned window pass — `runOns` maps source
    * column → output running-sum name (rank statistics need one
    * cumulative count per sample). */
  def withGlobalRanks(df: DataFrame, metric: String, key: String,
      descending: Boolean = false, nRanges: Int = 32,
      rkName: String = "rk",
      runOns: Seq[(String, String)] = Nil,
      nName: Option[String] = None): DataFrame = {
    val base = df.withColumn("__sm",
      if (descending) negate(col(metric)) else col(metric))
    val fr = (1 until nRanges).map(i => i.toDouble / nRanges)
    val cuts = base.agg(
      expr(s"approx_percentile(__sm, array(${fr.mkString(",")}), 100)")
        .as("__cuts"))
    val ranged = base.crossJoin(broadcast(cuts))
      .withColumn("__rng",
        expr("aggregate(__cuts, 0, (a, c) -> a + IF(__sm > c, 1, 0))"))
      .drop("__cuts")
    val totCols = runOns.zipWithIndex.map { case ((c, _), i) =>
      sum(col(c)).as(s"__tot$i")
    }
    val perRange = ranged.groupBy("__rng")
      .agg(count(lit(1)).as("__cnt"), totCols: _*)
    // tiny: ≤ nRanges rows — the only unpartitioned windows in the plan
    val wOff = Window.orderBy("__rng")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("__rng")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offTotCols = runOns.indices.map(i =>
      coalesce(sum(col(s"__tot$i")).over(wOff), lit(0L)).as(s"__offTot$i"))
    val offsets = perRange.select(Seq(col("__rng"),
      coalesce(sum(col("__cnt")).over(wOff), lit(0L)).as("__offCnt"),
      sum(col("__cnt")).over(wAll).as("__nTot")) ++ offTotCols: _*)
    val wIn = Window.partitionBy("__rng").orderBy(col("__sm"), col(key))
    val wRun = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = ranged.join(broadcast(offsets), "__rng")
      .withColumn(rkName, row_number().over(wIn).cast("long") + col("__offCnt"))
    val withRun = runOns.zipWithIndex.foldLeft(ranked) {
      case (acc, ((c, out), i)) =>
        acc.withColumn(out, sum(col(c)).over(wRun) + col(s"__offTot$i"))
    }
    val withN = nName match {
      case Some(nm) => withRun.withColumn(nm, col("__nTot"))
      case None => withRun
    }
    withN.drop(Seq("__sm", "__rng", "__offCnt", "__nTot") ++
      runOns.indices.map(i => s"__offTot$i"): _*)
  }

  /** Exact running sum of `value` over (PARTITION BY part ORDER BY
    * order...) when the partition key has tiny cardinality (e.g. 3
    * sources) — the case where a plain partitioned Window serializes
    * each partition onto one task. Two-level: rows sub-bucket by
    * `bucket` (must be monotone in the leading order column, and rows
    * equal on the order prefix must share a bucket — floor(id/W) on
    * the leading key satisfies both); the running sum runs under a
    * Window partitioned by (part, bucket), and per-bucket base
    * offsets come from a prefix sum over the tiny per-bucket totals,
    * broadcast back. Pick W so #buckets stays broadcastable (~10⁵–10⁶
    * at lake scale); parallelism becomes #part × #buckets instead of
    * #part.
    */
  def partitionedRunningSum(df: DataFrame, part: String,
      order: Seq[String], value: String, bucket: Column,
      cumName: String): DataFrame = {
    val b = df.withColumn("__bkt", bucket)
    val wIn = Window.partitionBy(col(part), col("__bkt"))
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perB = b.groupBy(col(part).as("__p"), col("__bkt").as("__b"))
      .agg(sum(col(value)).as("__tot"))
    val wOff = Window.partitionBy("__p").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = perB.select(col("__p"), col("__b"),
      coalesce(sum(col("__tot")).over(wOff), lit(0L)).as("__base"))
    b.join(broadcast(offs),
        col(part) === col("__p") && col("__bkt") === col("__b"))
      .withColumn(cumName, sum(col(value)).over(wIn) + col("__base"))
      .drop("__p", "__b", "__bkt", "__base")
  }

  /** The ntile(b) bucket of global rank `rk` among `n` rows — the
    * exact SQL-standard assignment (first n%b buckets get one extra
    * row). Pure integer arithmetic, map-side.
    */
  def ntileFromRank(rk: Column, n: Column, b: Int): Column = {
    val q = floor(n / b).cast("long")
    val r = n - q * b
    val qq = q + lit(1L)
    when(rk <= qq * r, floor((rk - lit(1L)) / qq).cast("long") + lit(1L))
      .otherwise(r + floor((rk - lit(1L) - qq * r)
        / greatest(q, lit(1L))).cast("long") + lit(1L))
  }
}
