package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-41 operators. */
class Extras43Spec extends SparkSpec {

  test("survival curve: monotone non-increasing; endpoints right; counts conserve") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_survival_curve")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val total = graft.io.Tables.orders(spark, sf0001)
      .select(countDistinct("o_custkey")).as[Long].head()
    assert(got.map(_._2).sum == total, "every customer's lifetime ends once")
    assert(got.last._3 == 0 && got.last._4 == 0, "curve reaches zero")
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1, "days strictly increasing")
        assert(a._3 >= b._3 && a._4 >= b._4, "survival non-increasing")
      case _ =>
    }
    got.foreach { case (_, ended, surviving, e6) =>
      assert(math.abs(e6 - surviving * 1e6 / total) <= 1, "share consistent")
      assert(ended > 0, "only days where someone's lifetime ends appear")
    }
  }

  test("Brown–Forsythe: dfs match f_oneway's; W differs from F (spread ≠ mean)") {
    import spark.implicits._
    val Array((nt, k, dfB, dfW, wE6)) =
      SparkEntry.queries("stat_levene")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect()
    val Array((nt2, k2, dfB2, dfW2, fE6)) =
      SparkEntry.queries("stat_f_oneway")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert((nt, k, dfB, dfW) == ((nt2, k2, dfB2, dfW2)), "same design")
    assert(wE6 >= 0, "W is a ratio of sums of squares")
    assert(wE6 != fE6, "W tests spread, F tests location")
    // naive replay on the absolute deviations
    val rows = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    val z = rows.groupBy(_._1).values.flatMap { g =>
      val cs = g.map(_._2).sorted
      val m = (cs((cs.length - 1) / 2) + cs(cs.length / 2)) / 2.0
      g.map(r => (r._1, math.abs(r._2 - m) * 2))
    }.toSeq
    val gm = z.map(_._2).sum / nt.toDouble
    val groups = z.groupBy(_._1).values.toSeq
    val ssb = groups.map(g => g.length *
      math.pow(g.map(_._2).sum / g.length - gm, 2)).sum
    val ssw = groups.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(r => math.pow(r._2 - m, 2)).sum
    }.sum
    val w = (ssb / dfB) / (ssw / dfW)
    assert(math.abs(wE6 - w * 1e6) <= 2, s"W: got $wE6, naive ${w * 1e6}")
  }
}
