package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-37 operators. */
class Extras39Spec extends SparkSpec {

  test("one-way ANOVA: F matches a naive two-pass computation; dfs partition n-1") {
    import spark.implicits._
    val Array((nt, k, dfB, dfW, fE6)) =
      SparkEntry.queries("stat_f_oneway")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(dfB + dfW == nt - 1, "df_between + df_within = n - 1")
    val rows = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    assert(nt == rows.length && k == rows.map(_._1).distinct.length)
    val gm = rows.map(_._2.toDouble).sum / nt
    val groups = rows.groupBy(_._1).values.toSeq
    val ssb = groups.map(g => g.length *
      math.pow(g.map(_._2.toDouble).sum / g.length - gm, 2)).sum
    val ssw = groups.map { g =>
      val m = g.map(_._2.toDouble).sum / g.length
      g.map(r => math.pow(r._2 - m, 2)).sum
    }.sum
    val f = (ssb / dfB) / (ssw / dfW)
    assert(math.abs(fE6 - f * 1e6) <= 2, s"F: got $fE6, naive ${f * 1e6}")
  }

  test("IQR audit: fences bracket the quartiles; outlier counts match a replay") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_outlier_iqr")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(String, Long)].collect()
    assert(got.map(_._2).sum == ev.length, "n partitions the table")
    got.foreach { case (t, n, q1x4, q3x4, nLow, nHigh, minC, maxC) =>
      val cs = ev.filter(_._1 == t).map(_._2).sorted
      assert(n == cs.length)
      def qc(p: Double): Double = {
        val h = (cs.length - 1) * p
        val l = h.toInt
        cs(l) + (h - l) * (cs(math.min(l + 1, cs.length - 1)) - cs(l))
      }
      val (q1, q3) = (qc(0.25), qc(0.75))
      assert(q1x4 == math.round(q1 * 4) && q3x4 == math.round(q3 * 4))
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(nLow == cs.count(_ < lo) && nHigh == cs.count(_ > hi), s"$t counts")
      assert(minC == (if (nLow == 0) -1 else cs.filter(_ < lo).min), s"$t min")
      assert(maxC == (if (nHigh == 0) -1 else cs.filter(_ > hi).max), s"$t max")
    }
  }
}
