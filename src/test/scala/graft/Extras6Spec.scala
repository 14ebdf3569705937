package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-3 operators beyond the DuckDB hash
  * gate: rolling-variance algebra against a reference fold, Pareto
  * boundary exactness, one-hot completeness, threshold-vs-ntile
  * bucketing semantics, URL canonical idempotence. */
class Extras6Spec extends SparkSpec {

  test("rolling variance numerator matches a per-row scala fold") {
    import spark.implicits._
    val rows = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime, r._3))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.zipWithIndex.map { case ((_, _, eid, _), i) =>
        val w = g.slice(math.max(0, i - 23), i + 1).map(_._4)
        val n = w.size.toLong
        eid -> (n * w.map(c => c * c).sum - w.sum * w.sum)
      }
    }
    val got = SparkEntry.queries("window_rolling_var")(spark, sf0001)
      .select("event_id", "var_num_cents2").as[(Long, Long)].collect().toMap
    assert(got.size == rows.length)
    expected.foreach { case (eid, v) =>
      assert(got(eid) == v, s"event_id=$eid")
    }
    // variance numerator n·Σx²−(Σx)² is non-negative by Cauchy-Schwarz
    assert(got.values.forall(_ >= 0))
  }

  test("pareto boundary: top-(n-1) customers stay under 80%, top-n reach it") {
    import spark.implicits._
    val Array((nTop, _, total)) = SparkEntry.queries("analytics_pareto")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val cents = graft.io.Tables.orders(spark, sf0001).groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .select("c").as[Long].collect().sorted(Ordering[Long].reverse)
    assert(cents.sum == total)
    assert(5 * cents.take(nTop.toInt).sum >= 4 * total)
    assert(5 * cents.take(nTop.toInt - 1).sum < 4 * total)
  }

  test("one-hot rows have exactly one hot column; counts match groupBy") {
    import spark.implicits._
    val df = SparkEntry.queries("feature_onehot")(spark, sf0001)
    val hotCols = df.columns.filter(_.startsWith("seg_"))
    val rowSums = df.select(hotCols.map(col).reduce(_ + _).as("s")).as[Long].collect()
    assert(rowSums.forall(_ == 1L))
    val fromOneHot = hotCols.map(c => c -> df.agg(sum(col(c))).as[Long].head()).toMap
    val fromGroup = graft.io.Tables.customer(spark, sf0001)
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect()
      .map { case (seg, n) => s"seg_${seg.toLowerCase}" -> n }.toMap
    assert(fromOneHot == fromGroup)
  }

  test("threshold buckets are ordered, complete, and respect the cut points") {
    import spark.implicits._
    val b = SparkEntry.queries("feature_quantile_bucket")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(b.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(b.map(_._2).sum ==
      graft.io.Tables.orders(spark, sf0001).count())
    // bucket value ranges must not overlap: hi(k) < lo(k+1)
    b.sliding(2).foreach { case Array(x, y) =>
      assert(x._4 < y._3, s"bucket ${x._1} hi=${x._4} vs ${y._1} lo=${y._3}")
    }
  }

  test("ohlc: open/close come from first/last event of the day, high >= low") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_ohlc")(spark, sf0001)
      .as[(Long, java.sql.Timestamp, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, day, o, c, h, l, n) =>
      assert(h >= l && h >= o && h >= c && l <= o && l <= c && n >= 1,
        s"user=$u day=$day")
    }
    // cross-check one (user, day) group row-by-row
    val (u0, d0) = (got.head._1, got.head._2)
    val ev = graft.io.Tables.events(spark, sf0001)
      .filter(col("user_id") === u0 &&
        date_trunc("day", col("ts")) === lit(d0))
      .select(col("ts"), col("event_id"), round(col("value") * 1e6).cast("long").as("v6"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy(r => (r._1.getTime, r._2))
    assert(got.head._3 == ev.head._3 && got.head._4 == ev.last._3)
    assert(got.head._5 == ev.map(_._3).max && got.head._6 == ev.map(_._3).min)
    assert(got.head._7 == ev.length)
  }

  test("url canonicalization is idempotent and drops only the query string") {
    import spark.implicits._
    val c = SparkEntry.queries("dedup_url")(spark, sf0001)
    val canon = c.select("canonical").as[String].collect()
    canon.foreach { u =>
      assert(u == u.toLowerCase && !u.contains("?") && !u.endsWith("/"), u)
    }
    // every document lands in exactly one group
    import org.apache.spark.sql.Row
    val Row(total: Long) = c.agg(sum("n_dups")).head()
    assert(total == graft.io.Tables.documents(spark, sf0001).count())
  }
}
