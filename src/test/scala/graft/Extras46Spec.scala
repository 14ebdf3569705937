package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-44 operators. */
class Extras46Spec extends SparkSpec {

  test("activity heatmap: cells bounded, counts conserve, dow in Spark convention") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_activity_heatmap")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
    assert(got.map(_._3).sum == ev.count(), "every event in exactly one cell")
    assert(got.length <= 168, "at most 7×24 cells")
    got.foreach { case (dow, hr, n, _) =>
      assert(dow >= 1 && dow <= 7 && hr >= 0 && hr <= 23 && n > 0)
    }
    // cent totals conserve too
    val totalCents = ev.select(sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .as[Long].head()
    assert(got.map(_._4).sum == totalCents)
  }

  test("2-D histogram: grid partitions lineitem; revenue conserves") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_histogram2d")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val li = graft.io.Tables.lineitem(spark, sf0001)
    assert(got.map(_._3).sum == li.count(), "counts partition the table")
    val totalRev = li.select(
      sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))).as[Long].head()
    assert(got.map(_._4).sum == totalRev, "revenue conserves across cells")
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length, "cells unique")
    assert(got.length > 1, "more than one populated cell")
  }
}
