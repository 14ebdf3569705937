package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-38 operators. */
class Extras40Spec extends SparkSpec {

  test("rolling corr: bounded in [-1,1]; matches a naive replay on one user") {
    import spark.implicits._
    val got = SparkEntry.queries("window_rolling_corr")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
    val u = got.head._1
    val series = graft.io.Tables.events(spark, sf0001)
      .filter(col("user_id") === u)
      .select(col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)"))
      .as[(java.sql.Timestamp, Long, Long, Long)].collect()
      .sortBy(r => (r._1.getTime, r._2))
    got.filter(_._1 == u).foreach { case (_, eid, corrE6) =>
      val i = series.indexWhere(_._2 == eid)
      val w = series.slice(i - 9, i + 1)
      assert(w.length == 10, "frame full")
      val xs = w.map(_._3.toDouble); val ys = w.map(_._4.toDouble)
      val (mx, my) = (xs.sum / 10, ys.sum / 10)
      val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
      assert(math.abs(corrE6 - num / den * 1e6) <= 2, s"event $eid")
    }
  }

  test("robust scale: median maps to 0; half the group is non-positive") {
    import spark.implicits._
    val got = SparkEntry.queries("feature_robust_scale")(spark, sf0001)
      .as[(Long, Long)].collect()
    val n = graft.io.Tables.orders(spark, sf0001).count()
    assert(got.length == n, "one row per order")
    // robust scaling centers at the median: at least half at or below 0
    assert(got.count(_._2 <= 0) * 2 >= n, "median-centered")
    assert(got.count(_._2 > 0) > 0 && got.count(_._2 < 0) > 0)
  }
}
