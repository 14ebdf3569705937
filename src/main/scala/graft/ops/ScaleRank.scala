package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe exact global ranking.
  *
  * `ntile` / `row_number` / running sums over an unpartitioned Window
  * are single-partition sorts — the one shape that cannot survive a
  * 100× scale-up. This helper computes the SAME exact numbers with a
  * two-phase range-partitioned plan:
  *
  *   1. approx_percentile sketches ~`nRanges` metric cutpoints in ONE
  *      mergeable partial-agg pass (fused across metrics for
  *      [[withGlobalRanksMulti]]), COLLECTED to the driver (≤ nRanges
  *      scalars) and embedded downstream as literals — range
  *      assignment therefore cannot drift between subplan evaluations
  *      even though the sketch's partial-merge order is
  *      nondeterministic (the cutpoints need NOT be exact — any
  *      metric-monotone bucketing preserves exact ranks, the sketch
  *      only balances the ranges);
  *   2. each row maps to a range by comparing against the literal
  *      cutpoints (map-side, codegen'd);
  *   3. per-range counts/sums (≤ #cells rows, collected) prefix-sum
  *      into per-range offsets, rebroadcast as a driver-built tiny
  *      table;
  *   4. row_number / running sum run under a Window PARTITIONED by
  *      range, plus the broadcast offset.
  *
  * Rows with equal metric values always share a range (assignment
  * depends only on the metric), so the within-range (metric, key)
  * order is exactly the global order restricted to the range — ranks
  * and running sums match the global-sort spelling bit-for-bit, while
  * the largest sort is ~1/nRanges of the data.
  *
  * '''Tie-mass skew guard.''' A range partitioner's balance is bounded
  * by the largest tie mass: a metric where one value carries 30% of
  * the rows (order counts, token counts, …) puts 30% of the data in
  * one range. Step 3's collected counts detect this for free: any
  * range holding > `skewFactor`/nRanges of the rows triggers a
  * sub-split of its heavy VALUES by the ranking's own tiebreaker key —
  * per-value key cutpoints come from a deterministic xxhash64 sample
  * (sorted Spark-side, so driver collation never matters), and rows
  * tied on the metric then fan out across sub-cells in (metric, key)
  * order. Because the cells still partition the data in exact global
  * order, offset + within-cell row_number stays bit-identical to the
  * global sort; only the physical balance changes. Rows whose key
  * type defeats sampling, or residual medium ties below the
  * threshold, simply stay unsplit — correctness never depends on the
  * guard.
  *
  * '''Eagerness.''' Collecting cutpoints/counts makes this helper run
  * 2 small driver actions at plan-construction time (plus 3 when the
  * skew guard fires). The inputs must therefore be deterministic
  * DataFrames (every caller here derives from parquet scans), and the
  * helper is for BATCH plans only — it cannot appear inside a
  * streaming query. The collected payloads are aggregate scalars
  * (≤ #cells rows), the same information the previous lazy spelling
  * broadcast anyway.
  */
object ScaleRank {

  /** One ranking request for [[withGlobalRanksMulti]]: exact global
    * row numbers over ORDER BY metric asc|desc, key ASC as `rkName`,
    * optional running sums (`runOns`: source → output name) in the
    * same window pass, optional total row count as `nName`. */
  final case class RankOn(metric: String, rkName: String = "rk",
      descending: Boolean = false,
      runOns: Seq[(String, String)] = Nil,
      nName: Option[String] = None)

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
      nName: Option[String] = None): DataFrame =
    withGlobalRanksMulti(df,
      Seq(RankOn(metric, rkName, descending, runOns, nName)), key, nRanges)

  /** Several independent exact rankings over the SAME frame (RFM's
    * three quintiles, …) sharing one fused sketch pass and one fused
    * count pass instead of one round-trip per metric. Each ranking
    * still needs its own partitioned window (they sort by different
    * columns), but the scan-side work is paid once. */
  def withGlobalRanksMulti(df: DataFrame, ranks: Seq[RankOn], key: String,
      nRanges: Int = 32, skewFactor: Double = 2.0,
      keepCells: Boolean = false): DataFrame = {
    require(ranks.nonEmpty)
    val spark = df.sparkSession
    val nM = ranks.size
    // Pass 2 collects up to nRanges^nM joint cells to the driver. Fine
    // at the registered call shapes (nM ≤ 3, 32³ ≈ 33k cells), but an
    // unguarded 5-metric call at the default nRanges=32 would collect
    // up to 33M rows — a driver OOM. Refuse upfront; callers with many
    // metrics should lower nRanges or marginalize per metric.
    require(math.pow(nRanges.toDouble, nM.toDouble) <= 1e6,
      s"withGlobalRanksMulti: nRanges^nM = $nRanges^$nM exceeds the 1e6 " +
        "joint-cell driver-collect bound; lower nRanges or split the rankings")

    def smName(i: Int) = s"__sm$i"
    def rngName(i: Int) = s"__rng$i"
    def ckName(i: Int) = s"__ck$i"

    val base = ranks.zipWithIndex.foldLeft(df) { case (acc, (r, i)) =>
      acc.withColumn(smName(i),
        if (r.descending) negate(col(r.metric)) else col(r.metric))
    }

    // ---- pass 1 (fused): cutpoint sketches for every metric ----
    val fr = (1 until nRanges).map(i => i.toDouble / nRanges)
    val frSql = fr.mkString(",")
    val cutsRow = base.agg(
      expr(s"approx_percentile(${smName(0)}, array($frSql), 100)").as("c0"),
      (1 until nM).map(i =>
        expr(s"approx_percentile(${smName(i)}, array($frSql), 100)")
          .as(s"c$i")): _*).head()
    val cutsOf: IndexedSeq[Seq[Any]] = (0 until nM).map { i =>
      if (cutsRow.isNullAt(i)) Nil
      else cutsRow.getSeq[Any](i).filter(_ != null)
    }

    def rangeOf(sm: Column, cuts: Seq[Any], nullsLast: Boolean): Column = {
      val byCuts = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(sm > lit(c), 1).otherwise(0)
      }
      // NULL metrics: Spark orders them FIRST under ASC — which the
      // comparisons above already produce (every `sm > c` is NULL →
      // otherwise(0) → range 0) — but LAST under DESC. For descending
      // rankings NULLs therefore get their own TERMINAL range, so
      // their ranks follow every non-null row, matching
      // `ORDER BY m DESC` default NULLS LAST (previously they ranked
      // FIRST — divergent from the window spelling this helper claims
      // bit-identity with).
      if (nullsLast) when(sm.isNull, lit(cuts.size + 1)).otherwise(byCuts)
      else byCuts
    }

    val ranged = (0 until nM).foldLeft(base) { (acc, i) =>
      acc.withColumn(rngName(i),
        rangeOf(col(smName(i)), cutsOf(i), ranks(i).descending))
    }

    // ---- pass 2 (fused): per-(joint range) counts + running-sum
    // totals, collected (≤ nRanges^nM observed cells, in practice a
    // few hundred) and marginalized per metric on the driver. All
    // registered runOns are exact integers (repo float policy), so
    // driver-side marginalization is exact; fractional sums would add
    // in ascending joint-cell order (deterministic, but a different
    // order than a direct per-range aggregate).
    val aggExprs = count(lit(1)).as("__cnt") +:
      ranks.zipWithIndex.flatMap { case (r, i) =>
        r.runOns.zipWithIndex.map { case ((src, _), j) =>
          sum(col(src)).as(s"__tot_${i}_$j")
        }
      }
    val jointRows = ranged
      .groupBy((0 until nM).map(i => col(rngName(i))): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
    val nTotal = jointRows.map(_.getAs[Long]("__cnt")).sum
    val heavyThreshold =
      math.max(1L, math.ceil(nTotal.toDouble * skewFactor / nRanges).toLong)

    // exact driver addition for the collected Spark sum types
    def addAny(a: Any, b: Any): Any = (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x: java.lang.Long, y: java.lang.Long) =>
        java.lang.Long.valueOf(x + y)
      case (x: java.lang.Integer, y: java.lang.Integer) =>
        java.lang.Integer.valueOf(x + y)
      case (x: java.lang.Double, y: java.lang.Double) =>
        java.lang.Double.valueOf(x + y)
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case (x: java.lang.Long, y: java.lang.Integer) =>
        java.lang.Long.valueOf(x + y.longValue())
      case (x: java.lang.Integer, y: java.lang.Long) =>
        java.lang.Long.valueOf(x.longValue() + y)
      case _ => throw new IllegalArgumentException(
        s"unsupported runOn sum types: ${a.getClass} + ${b.getClass}")
    }
    def zeroLike(a: Any): Any = a match {
      case _: java.lang.Integer => java.lang.Integer.valueOf(0)
      case _: java.lang.Double => java.lang.Double.valueOf(0d)
      case x: java.math.BigDecimal => java.math.BigDecimal.ZERO
      case _ => java.lang.Long.valueOf(0L)
    }
    // ---- per-metric cell assignment (+ optional skew sub-split) ----
    // celled: frame with one __ck$i cell column per metric; cellStats:
    // per metric, rows of (cellId, cnt, tot_j...) in ascending cellId
    // order, from which the driver builds the offset table.
    var frame = ranged
    val offsetsDfs = ArrayBuffer.empty[(Int, DataFrame)]

    for (i <- 0 until nM) {
      val r = ranks(i)
      val sm = col(smName(i))
      val marginal: Map[Int, (Long, IndexedSeq[Any])] = jointRows
        .groupBy(_.getAs[Int](rngName(i)))
        .map { case (rng, rows) =>
          val cnt = rows.map(_.getAs[Long]("__cnt")).sum
          val tots = r.runOns.indices.map { j =>
            rows.map(_.getAs[Any](s"__tot_${i}_$j"))
              .reduceOption(addAny).orNull
          }
          rng -> (cnt, tots.toIndexedSeq)
        }
      val heavyRanges = marginal.filter(_._2._1 > heavyThreshold).keySet

      // (cellColumn, per-cell stats rows (cellId, cnt, tots)) —
      // either the ranges themselves or the sub-split cells
      val (cellCol, stats): (Column, Seq[(Int, Long, IndexedSeq[Any])]) =
        if (heavyRanges.isEmpty) {
          (col(rngName(i)),
            marginal.toSeq.sortBy(_._1)
              .map { case (c, (n, t)) => (c, n, t) })
        } else {
          // heavy tie values inside the heavy ranges (a range can only
          // exceed the threshold by ~sketch error unless single values
          // carry it); cap at 8 — each extra value is more expression
          // text for a residual already below 8× threshold
          val heavyVals = ranged
            .filter(col(rngName(i)).isin(heavyRanges.toSeq: _*) &&
              sm.isNotNull)
            .groupBy(sm.as("v")).agg(count(lit(1)).as("c"))
            .filter(col("c") > heavyThreshold)
            .orderBy(col("c").desc, col("v"))
            .limit(8)
            .collect()
            .map(row => (row.get(0), row.getAs[Long]("c")))
          if (heavyVals.isEmpty) {
            (col(rngName(i)),
              marginal.toSeq.sortBy(_._1)
                .map { case (c, (n, t)) => (c, n, t) })
          } else {
            // deterministic key sample per heavy value, sorted by
            // SPARK's ordering (sort_array) so the driver only indexes.
            // Buffer bound: the hash-mod filter keeps an expected
            // ≤ ~2048·(cnt/minCnt) keys per heavy value (heavy values
            // are themselves ≤ the range count), so the collected
            // sample is a driver-sized cut-point payload, never the
            // column.
            val minCnt = heavyVals.map(_._2).min
            val step = math.max(1L, minCnt / 2048L)
            val sampleRows = ranged
              .filter(sm.isin(heavyVals.toIndexedSeq.map(_._1): _*) &&
                pmod(xxhash64(col(key)), lit(step)) === 0)
              .groupBy(sm.as("v"))
              .agg(sort_array(collect_list(col(key))).as("ks"))
              .collect()
            val samplesByVal: Map[Any, Seq[Any]] =
              sampleRows.map(row => row.get(0) -> row.getSeq[Any](1)).toMap
            val targetCell = math.max(1L, nTotal / nRanges)
            // heavy values grouped by range, ascending in __sm order
            val splitsByRange: Map[Int, Seq[(Any, Seq[Any])]] = heavyVals
              .map { case (v, cnt) =>
                val rng = cutsOf(i).count { c =>
                  // same comparison Spark evaluates: v > c
                  compareAny(v, c) > 0
                }
                val m = math.min(64L,
                  math.max(2L, math.ceil(cnt.toDouble / targetCell).toLong))
                  .toInt
                val sample = samplesByVal.getOrElse(v, Nil)
                val subCuts =
                  if (sample.isEmpty) Nil
                  else (1 until m).map(q =>
                    sample(math.min(sample.size - 1,
                      q * sample.size / m))).distinct
                (rng, v, subCuts)
              }
              .groupBy(_._1)
              .map { case (rng, vs) =>
                rng -> vs.toSeq.map(t => (t._2, t._3))
                  .sortWith((a, b) => compareAny(a._1, b._1) < 0)
              }
            // driver-ordered cell ids: for each range ascending, the
            // alternating residual / per-value sub-cells, globally
            // monotone in (__sm, key)
            var next = 0
            // descending metrics carry an extra terminal NULL range
            val maxRng =
              cutsOf(i).size + (if (r.descending) 1 else 0)
            val perRangeExprs = (0 to maxRng).map { rng =>
              splitsByRange.get(rng) match {
                case None =>
                  val e = lit(next); next += 1; (rng, e)
                case Some(splits) =>
                  val firstId = next
                  var e: Column = when(sm.isNull, lit(firstId))
                  splits.foreach { case (v, subCuts) =>
                    e = e.when(sm < lit(v), lit(next)); next += 1
                    val subIdx = subCuts.foldLeft(lit(0)) { (acc, kc) =>
                      acc + when(col(key) > lit(kc), 1).otherwise(0)
                    }
                    e = e.when(sm === lit(v), lit(next) + subIdx)
                    next += subCuts.size + 1
                  }
                  val out = e.otherwise(lit(next)); next += 1
                  (rng, out)
              }
            }
            val cellExpr = perRangeExprs.init.foldRight(
              perRangeExprs.last._2) { case ((rng, e), acc) =>
              when(col(rngName(i)) === rng, e).otherwise(acc)
            }
            frame = frame.withColumn(ckName(i), cellExpr)
            // ---- extra pass (skew path only): recount per cell ----
            val cellAggs = count(lit(1)).as("__cnt") +:
              r.runOns.zipWithIndex.map { case ((src, _), j) =>
                sum(col(src)).as(s"__tot_$j")
              }
            val cellRows = frame.groupBy(col(ckName(i)).as("c"))
              .agg(cellAggs.head, cellAggs.tail: _*)
              .collect()
            (col(ckName(i)),
              cellRows.map { row =>
                (row.getAs[Int]("c"), row.getAs[Long]("__cnt"),
                  r.runOns.indices
                    .map(j => row.getAs[Any](s"__tot_$j")).toIndexedSeq)
              }.toSeq.sortBy(_._1))
          }
        }

      if (frame.columns.contains(ckName(i)) == false)
        frame = frame.withColumn(ckName(i), cellCol)

      // ---- driver prefix offsets → tiny broadcast table ----
      // per runOn, each cell also carries __op = "every PRIOR cell's
      // total was null" — the flag that lets the final expression
      // reproduce the global window's null semantics exactly (sum
      // ignores nulls; the result is null only when the WHOLE prefix
      // is null, which cell-local state alone cannot decide)
      var runCnt = 0L
      val runTots = Array.fill[Any](r.runOns.size)(null)
      val offRows = stats.map { case (cell, cnt, tots) =>
        val offVals = r.runOns.indices.map { j =>
          if (runTots(j) == null && tots(j) != null) zeroLike(tots(j))
          else runTots(j)
        }
        val priorNull = r.runOns.indices.map(j => runTots(j) == null)
        val row = Row.fromSeq(
          (cell +: runCnt +: offVals) ++ priorNull)
        runCnt += cnt
        r.runOns.indices.foreach(j =>
          runTots(j) = addAny(runTots(j), tots(j)))
        row
      }
      val sumTypes = r.runOns.indices.map { j =>
        stats.collectFirst {
          case (_, _, tots) if tots(j) != null => tots(j)
        } match {
          case Some(_: java.lang.Integer) => IntegerType
          case Some(_: java.lang.Double) => DoubleType
          case Some(d: java.math.BigDecimal) =>
            DecimalType(math.max(d.precision, 20), d.scale)
          case _ => LongType
        }
      }
      val offSchema = StructType(
        (StructField(ckName(i), IntegerType) +:
          StructField(s"__oc$i", LongType) +:
          r.runOns.indices.map(j =>
            StructField(s"__ot_${i}_$j", sumTypes(j)))) ++
          r.runOns.indices.map(j =>
            StructField(s"__op_${i}_$j", BooleanType)))
      val offsets = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(offRows).asJava), offSchema)
      offsetsDfs += ((i, offsets))
    }

    // ---- final: per-metric partitioned window + broadcast offsets ----
    var out = frame
    for ((i, offsets) <- offsetsDfs) {
      val r = ranks(i)
      out = out.join(broadcast(offsets), ckName(i))
      val wIn = Window.partitionBy(ckName(i))
        .orderBy(col(smName(i)), col(key))
      val wRun = wIn.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      out = out.withColumn(r.rkName,
        row_number().over(wIn).cast("long") + col(s"__oc$i"))
      r.runOns.zipWithIndex.foreach { case ((src, outName), j) =>
        // exact global-window null parity: the within-cell prefix sum
        // is null for an all-null local prefix, but the GLOBAL running
        // sum is null only when no non-null value precedes anywhere —
        // i.e. local prefix all-null AND every prior cell total null
        // (__op). A plain local+offset addition would null out rows
        // whose prior cells carried real totals.
        val local = sum(col(src)).over(wRun)
        val off = col(s"__ot_${i}_$j")
        out = out.withColumn(outName,
          when(local.isNull && col(s"__op_${i}_$j"), local)
            .otherwise(coalesce(local, lit(0)) + coalesce(off, lit(0))))
      }
      r.nName.foreach(nm => out = out.withColumn(nm, lit(nTotal)))
    }
    // keepCells is a test-only hook: the spec asserts the skew guard
    // actually balanced the window partitions via the __ck$i columns
    val drop = (0 until nM).flatMap { i =>
      Seq(smName(i), rngName(i), s"__oc$i") ++
        (if (keepCells) Nil else Seq(ckName(i))) ++
        ranks(i).runOns.indices.flatMap(j =>
          Seq(s"__ot_${i}_$j", s"__op_${i}_$j"))
    }
    out.drop(drop: _*)
  }

  /** Spark-consistent driver comparison for the literal cut/heavy
    * values (numeric + string + date/timestamp covers every caller). */
  private def compareAny(a: Any, b: Any): Int = (a, b) match {
    case (x: java.lang.Number, y: java.lang.Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.sql.Date, y: java.sql.Date) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"unsupported metric type: ${a.getClass}")
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
    // null-safe equality: a NULL partition key (or NULL-keyed bucket)
    // forms its own window partition exactly like PARTITION BY does —
    // plain === would evaluate NULL for those rows and the inner join
    // would silently DROP them from the output
    b.join(broadcast(offs),
        col(part) <=> col("__p") && col("__bkt") <=> col("__b"))
      .withColumn(cumName, sum(col(value)).over(wIn) + col("__base"))
      .drop("__p", "__b", "__bkt", "__base")
  }

  /** Exact discrete quantiles (percentile_disc semantics: the smallest
    * value whose CDF ≥ p) computed DISTRIBUTED — the scale-safe
    * replacement for `percentile_disc` WITHIN GROUP over a whole
    * column, whose implementation buffers EVERY value into one
    * aggregation buffer per percentile (measured: 3 quartile cutpoints
    * on 600k lineitem cents cost 4.3 s serial at sf0.1; at 100 TB the
    * buffer simply does not fit). Shape here: reduce to the
    * domain-bounded (value, count) table (one map-side-combined
    * shuffle), cumulative counts via [[withGlobalRanks]]' partitioned
    * running sum (no single-partition window), then ONE tiny aggregate
    * picks each quantile as min(value | run·den ≥ num·n) — the CDF
    * comparison in exact integers, `fractions` given as (num, den)
    * rationals so no float ever touches the rank arithmetic.
    *
    * Returns a 1-row DataFrame with one column per fraction (named by
    * `names`, same value type as `valueCol`) — crossJoin(broadcast(…))
    * it exactly like the percentile_disc aggregate it replaces.
    * Inherits ScaleRank's eagerness: batch plans over deterministic
    * inputs only.
    */
  def exactQuantilesDisc(df: DataFrame, valueCol: String,
      fractions: Seq[(Int, Int)], names: Seq[String],
      nRanges: Int = 32): DataFrame = {
    // Reduce to the domain-bounded (value, count) table FIRST (one
    // map-side-combined shuffle), then rank the DISTINCT values and
    // carry the cumulative ROW count as a running sum of the counts in
    // the same window pass. Ranking rows directly would be one shuffle
    // cheaper on mostly-distinct columns, but with key == metric the
    // tie-skew guard cannot sub-split a heavy tied value (all its key
    // samples are identical), so a value carrying a 30% row share
    // would land in ONE window cell — the single-task-sort bottleneck
    // this helper exists to avoid, and nothing stops a caller passing
    // such a column. After the reduction ties cannot exist by
    // construction (a heavy value is one row), so the hazard is gone
    // for every caller instead of documented in a NOTE; the extra
    // shuffle is map-side combined and at most the distinct-value
    // width. NULL values are dropped first, matching percentile_disc
    // (unfiltered they would sort first and shift every rank; n counts
    // non-null rows only).
    val vc = df.select(col(valueCol).as("__v")).filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__cnt"))
      // three consumers inside the Counted entry (sketch, per-range
      // masses, targeted selection) — checkpoint HERE so the row-level
      // entry's reduction runs once, while already-checkpointed
      // Counted callers are not re-materialized (r16, guide §1.2)
      .localCheckpoint(false)
    exactQuantilesDiscCounted(vc, "__v", "__cnt", fractions, names, nRanges)
  }

  /** [[exactQuantilesDisc]] over an ALREADY-REDUCED (value, count)
    * relation — for callers that materialize the distinct-value table
    * anyway (equi-height histogram statistics compute per-bin
    * ndv/min/max from it), so the fact is scanned once instead of once
    * per consumer (r16, guide §2.3 aggregate-before-shuffle). NULL
    * values are dropped here exactly as in the row-level entry, so
    * both spellings agree for any input. */
  def exactQuantilesDiscCounted(vc0: DataFrame, valueCol: String,
      cntCol: String, fractions: Seq[(Int, Int)], names: Seq[String],
      nRanges: Int = 32): DataFrame = {
    requireFractions(fractions, names)
    // three consumers below (sketch, per-range masses, the targeted
    // selection) — callers materialize the reduced relation themselves
    // (the registered ones all localCheckpoint it; the row-level entry
    // above checkpoints before delegating)
    val vc = vc0.select(col(valueCol).as("__v"),
        col(cntCol).cast("long").as("__cnt"))
      .filter(col("__v").isNotNull)
    // r16 TARGETED-RANGE SELECTION (guide §1.2): the former spelling
    // ranked EVERY distinct value (withGlobalRanks: full per-range
    // running-sum window over the whole reduced relation) and then
    // min-filtered to ≤|fractions| answers. A discrete quantile only
    // needs the running sum INSIDE the range that contains its target
    // mass, and the per-range masses are already collected for the
    // offset table — so locate each target's range on the driver and
    // window only those ≤|fractions| ranges (~1/nRanges of the values
    // each). Same cutpoint sketch, same exact-integer CDF comparison,
    // same answers; the eager-action count is unchanged (cuts head +
    // mass collect, exactly withGlobalRanks' two).
    val frs = (1 until nRanges).map(i => i.toDouble / nRanges)
    val cutsRow = vc.agg(
      expr(s"approx_percentile(__v, array(${frs.mkString(",")}), 100)")
        .as("c")).head()
    val cuts: Seq[Any] =
      if (cutsRow.isNullAt(0)) Nil
      else cutsRow.getSeq[Any](0).filter(_ != null)
    // ascending range id — the same metric-monotone bucketing as
    // withGlobalRanksMulti.rangeOf (nulls already filtered)
    val rangeCol = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("__v") > lit(c), 1).otherwise(0) }
    val ranged = vc.withColumn("__rng", rangeCol)
    val masses = ranged.groupBy("__rng")
      .agg(sum("__cnt").as("__m")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = masses.map(_._2).sum
    if (n == 0L) {
      // empty input: one all-null row, same shape as the aggregate-
      // over-empty the previous spelling produced
      val aggs = fractions.zip(names).map { case (_, nm) =>
        min(when(lit(false), col("__v"))).as(nm) }
      return vc.agg(aggs.head, aggs.tail: _*)
    }
    val prefix = masses.scanLeft(0L)(_ + _._2) // mass strictly before range i
    // target mass per fraction: smallest m with m·den ≥ num·n
    val needed = fractions.map { case (num, den) =>
      val t = (num.toLong * n + den - 1) / den
      val i = prefix.indexWhere(_ >= t, 1) - 1
      masses(i)._1
    }.distinct
    val sel = ranged.filter(col("__rng").isin(needed.map(_.asInstanceOf[Any]): _*))
    val spark = vc.sparkSession
    import spark.implicits._
    val bases = masses.zip(prefix.dropRight(1))
      .map { case ((rng, _), base) => (rng, base) }
      .filter(p => needed.contains(p._1))
      .toSeq.toDF("__rng", "__base")
    val w = Window.partitionBy("__rng").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runed = sel.join(broadcast(bases), "__rng")
      .withColumn("__run", sum(col("__cnt")).over(w) + col("__base"))
    // smallest value whose CDF ≥ num/den ⇔ min value whose cumulative
    // row count reaches ⌈num·n/den⌉ ⇔ min(v | run·den ≥ num·n) — the
    // CDF comparison in exact integers (n is driver-exact from the
    // collected masses, embedded as a literal)
    val aggs = fractions.zip(names).map { case ((num, den), nm) =>
      min(when(col("__run") * den >= lit(n) * num, col("__v"))).as(nm)
    }
    runed.agg(aggs.head, aggs.tail: _*)
  }

  /** The 1-row equi-height cutpoint table for `nBins` bins of
    * `valueCol` (columns q1..q(nBins−1)) — [[exactQuantilesDisc]] with
    * the (i, nBins) fractions spelled once. Pair with [[binByCuts]];
    * compute the cuts separately when several frames must bin against
    * the SAME boundaries (join_cost_advisor bins fact and dim sides
    * into one histogram). */
  def quantileCuts(df: DataFrame, valueCol: String, nBins: Int): DataFrame =
    exactQuantilesDisc(df, valueCol,
      (1 until nBins).map(_ -> nBins), (1 until nBins).map(i => s"q$i"))

  /** Adds `binCol` ∈ 1..nBins to `df` by the broadcast when-chain over
    * a [[quantileCuts]] table: bin i ⇔ value ≤ qi (last bin catches
    * the rest) — the ONE spelling of the CASE ladder every equi-height
    * consumer (quantile buckets, histograms, PSI deciles, the join
    * cost advisor) previously hand-rolled, each needing to stay in
    * lockstep with its oracle's CASE text. Map-side only: the cuts
    * broadcast, the chain is codegen'd, no shuffle. */
  def binByCuts(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String, cuts: DataFrame): DataFrame = {
    val first = when(col(valueCol) <= col("q1"), 1L)
    val chain = (2 until nBins).foldLeft(first)((acc, i) =>
      acc.when(col(valueCol) <= col(s"q$i"), i.toLong))
    df.crossJoin(broadcast(cuts))
      .withColumn(binCol, chain.otherwise(nBins.toLong))
      .drop((1 until nBins).map(i => s"q$i"): _*)
  }

  /** [[quantileCuts]] + [[binByCuts]] in one call (single-frame case). */
  def binByQuantiles(df: DataFrame, valueCol: String, nBins: Int,
      binCol: String): DataFrame =
    binByCuts(df, valueCol, nBins, binCol, quantileCuts(df, valueCol, nBins))

  /** Per-GROUP exact discrete quantiles — [[exactQuantilesDisc]] for
    * `percentile_disc WITHIN GROUP ... GROUP BY g`, whose per-group
    * aggregation buffers hold every value of the group (a group at
    * 100 TB ÷ a handful of event types does not fit an executor).
    * Shape: reduce to the (group, value, count) table (one map-side-
    * combined shuffle), per-group cumulative counts via
    * [[partitionedRunningSum]] (two-level (group, bucket(value))
    * windows — no whole-group sort task), per-group totals broadcast
    * back, then one aggregate row per group picks min(value | run·den
    * ≥ num·n_g). `bucket` maps the value column to a sub-bucket id —
    * monotone in the value, ties share a bucket (floor at a width
    * suited to the domain); balance, never correctness, depends on it.
    *
    * Returns one row per group: (groupCol, names...), broadcast-join
    * it back to the fact like the aggregate it replaces.
    */
  def groupedQuantilesDisc(df: DataFrame, groupCol: String,
      valueCol: String, fractions: Seq[(Int, Int)], names: Seq[String],
      bucket: Column => Column): DataFrame = {
    requireFractions(fractions, names)
    val aggs = fractions.zip(names).map { case ((num, den), nm) =>
      min(when(col("__run") * den >= col("__n") * num, col("__v"))).as(nm)
    }
    groupedCdfAgg(df, groupCol, valueCol, bucket, aggs)
  }

  private def requireFractions(fractions: Seq[(Int, Int)],
      names: Seq[String]): Unit = {
    require(fractions.nonEmpty && fractions.size == names.size)
    require(fractions.forall { case (num, den) =>
      den > 0 && num > 0 && num <= den })
  }

  /** Per-group exact CONTINUOUS quantiles (percentile / quantile_cont
    * semantics: linear interpolation between the order statistics at
    * ranks ⌊h⌋+1 and ⌈h⌉+1 where h = (n−1)·p) over the same
    * distributed per-group CDF as [[groupedQuantilesDisc]] — replaces
    * `percentile(x, p) ... GROUP BY g`, whose per-group buffer holds
    * every value of the group. Rank arithmetic is exact-integer
    * (h·den = (n−1)·num); only the final interpolation is float:
    * v1 + (frac/den)·(v2−v1), which is EXACT (and engine-identical)
    * whenever the values are integers and den divides a power of two
    * (quarters/halves — the cents-grid callers here). Fractions with
    * non-dyadic denominators over non-integer values interpolate with
    * ordinary FP rounding — hash-gate such a caller before trusting
    * bit-equality. */
  def groupedQuantilesCont(df: DataFrame, groupCol: String,
      valueCol: String, fractions: Seq[(Int, Int)], names: Seq[String],
      bucket: Column => Column): DataFrame = {
    requireFractions(fractions, names)
    val aggs = fractions.zip(names).flatMap { case ((num, den), nm) =>
      // h·den = (n−1)·num; r1 = ⌊h⌋+1; r2 = r1 + (1 if h fractional).
      // ⌊h⌋ via [[longDiv]] (SQL's `div`, exact 64-bit) — `/` is
      // double division, whose rounding past 2^53 could shift r1 by
      // one on a huge group, silently picking the wrong order
      // statistic (the width-cliff class the SCALE audit tracks; fr's
      // `%` was always exact integer)
      val hnum = (col("__n") - 1) * num
      val r1 = longDiv(hnum, lit(den.toLong)) + 1
      val fr = hnum % den
      val r2 = r1 + when(fr > 0, 1L).otherwise(0L)
      Seq(
        min(when(col("__run") >= r1, col("__v"))).as(s"__lo_$nm"),
        min(when(col("__run") >= r2, col("__v"))).as(s"__hi_$nm"),
        // fr is group-constant; carry it out of the aggregate
        max(fr).cast("double").as(s"__fr_$nm"))
    }
    val raw = groupedCdfAgg(df, groupCol, valueCol, bucket, aggs)
    fractions.zip(names).foldLeft(raw) { case (acc, ((_, den), nm)) =>
      acc.withColumn(nm,
        col(s"__lo_$nm").cast("double") +
          col(s"__fr_$nm") / den *
            (col(s"__hi_$nm").cast("double") - col(s"__lo_$nm").cast("double")))
        .drop(s"__lo_$nm", s"__hi_$nm", s"__fr_$nm")
    }
  }

  /** Shared core of the grouped quantile/trim helpers: (group, value,
    * count) reduction, per-group cumulative counts via the two-level
    * [[partitionedRunningSum]], per-group totals broadcast back, one
    * output row per group from `aggs` (which see `__v` value, `__cnt`
    * rows at that value, `__run` cumulative rows ≤ value, `__n` group
    * total — a row's rank band is (__run−__cnt, __run]). NULL values
    * are dropped first (percentile semantics — nulls neither rank nor
    * count); a group whose values are ALL null therefore yields no
    * output row, where the builtin aggregate would yield a null — the
    * registered callers broadcast-join the result back, so the
    * difference surfaces as a missing (equally unusable) threshold. */
  private[ops] def groupedCdfAgg(df: DataFrame, groupCol: String,
      valueCol: String,
      bucket: Column => Column, aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty)
    // r16 (guide §1.2/§5): the reduced CDF relation feeds FOUR
    // consumers (the running-sum frame, its per-bucket offset
    // aggregate, the per-group totals, and through them the caller's
    // broadcast-back join) — without a checkpoint each re-ran the
    // group-value reduction over the fact. One lazy localCheckpoint
    // makes the reduction the single fact pass.
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false)
    val cum = partitionedRunningSum(vc, "__g", Seq("__v"), "__cnt",
      bucket(col("__v")), "__run")
    val tot = vc.groupBy("__g").agg(sum("__cnt").cast("long").as("__n"))
    // null-safe totals join: a NULL group key is a real group for
    // GROUP BY (and for the builtin percentile aggregates this helper
    // replaces); a USING join would drop it
    cum.join(broadcast(tot.withColumnRenamed("__g", "__g0")),
        col("__g") <=> col("__g0"))
      .drop("__g0")
      .groupBy("__g").agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__g", groupCol)
  }

  /** Exact ⌊a/b⌋ for non-negative longs as a pure Column. The public
    * Column API only spells `/` — DOUBLE division, whose rounding past
    * 2^53 is a silent off-by-one on exact-integer rank arithmetic
    * (and SQL's exact `div` operator has no Column form; the internal
    * IntegralDivide is private[sql]). Spelling: subtract the exact
    * `%` remainder, then divide the now-exactly-divisible numerator in
    * DECIMAL — decimal arithmetic is exact, and the integer quotient
    * fits the result type's 17 integer digits up to ~1e17, four
    * orders beyond the 100 TB row count (`/` would go wrong at 9e15). */
  private def longDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b).cast("long")

  /** The ntile(b) bucket of global rank `rk` among `n` rows — the
    * exact SQL-standard assignment (first n%b buckets get one extra
    * row). Pure integer arithmetic, map-side ([[longDiv]], not `/` —
    * double rounding past 2^53 would misassign buckets).
    */
  def ntileFromRank(rk: Column, n: Column, b: Int): Column = {
    val q = longDiv(n, lit(b.toLong))
    val r = n - q * b
    val qq = q + lit(1L)
    when(rk <= qq * r, longDiv(rk - lit(1L), qq) + lit(1L))
      .otherwise(r + longDiv(rk - lit(1L) - qq * r,
        greatest(q, lit(1L))) + lit(1L))
  }
}
