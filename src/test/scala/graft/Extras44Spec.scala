package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-42 operators. */
class Extras44Spec extends SparkSpec {

  test("rolling MAD: matches a naive replay; anomalies exceed 3 MADs") {
    import spark.implicits._
    val got = SparkEntry.queries("window_rolling_mad")(spark, sf0001)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    assert(got.length == ev.length)
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
    }
    got.foreach { case (u, eid, med, mad, flag) =>
      val series = byUser(u)
      val i = series.indexWhere(_._3 == eid)
      val frame = series.slice(math.max(0, i - 6), i + 1).map(_._4)
      assert(med == lowerMedian(frame), s"median at $u/$eid")
      assert(mad == lowerMedian(frame.map(x => math.abs(x - med))), s"mad at $u/$eid")
      assert(flag == (mad > 0 && math.abs(series(i)._4 - med) > 3 * mad))
    }
    assert(got.exists(_._5), "corpus contains at least one MAD anomaly")
  }

  test("banded DTW: zero iff halves identical; matches a full-matrix replay") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_dtw_band")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    // full-matrix banded DP, written independently of the operator's kernel
    def naive(a: Seq[Long], b: Seq[Long], band: Int): Long = {
      val INF = Long.MaxValue / 4
      val dp = Array.fill(a.length + 1, b.length + 1)(INF)
      dp(0)(0) = 0
      for (i <- 1 to a.length; j <- 1 to b.length if math.abs(i - j) <= band) {
        val p = Seq(dp(i - 1)(j), dp(i)(j - 1), dp(i - 1)(j - 1)).min
        if (p < INF) dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) + p
      }
      dp(a.length)(b.length)
    }
    got.foreach { case (u, nA, nB, cost) =>
      val cs = ev.filter(_._1 == u)
        .sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4).take(64)
      val (a, b) = cs.splitAt(cs.length / 2)
      assert(nA == a.length && nB == b.length, s"user $u split sizes")
      assert(cost == naive(a, b, 8), s"user $u cost")
    }
    // sanity on the kernel itself: identical series warp for free
    val xs = Array(1L, 5L, 9L, 2L)
    assert(graft.ops.Extras44.dtwBand(xs, xs, 8) == 0L)
  }
}
