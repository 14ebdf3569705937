package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-26 operators: trim accounting,
  * sliding double-count structure.
  */
class Extras28Spec extends SparkSpec {

  test("trimmed mean: kept = n - 2*ceil(n/10); between min and max of kept band") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_trimmed_mean")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), expr("CAST(round(o_totalprice*100) AS BIGINT)"))
      .as[(String, Long)].collect()
    got.foreach { case (pri, n, kept, tm) =>
      val g = raw.filter(_._1 == pri).map(_._2).sorted
      assert(n == g.length)
      val cut = math.ceil(n * 0.1).toLong
      assert(kept == n - 2 * cut, s"$pri trim accounting")
      val band = g.slice(cut.toInt, (n - cut).toInt)
      assert(tm == math.round(band.map(BigInt(_)).sum.toDouble / band.length),
        s"$pri recompute")
      // robust: trimmed mean within the kept band's range
      assert(tm >= band.head && tm <= band.last)
    }
  }

  test("sliding windows: every event counted exactly twice across windows") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_sliding_batch")(spark, sf0001)
      .as[(java.sql.Timestamp, String, Long)].collect()
    val total = graft.io.Tables.events(spark, sf0001).count()
    assert(got.map(_._3).sum == 2 * total, "window/slide = 2 slots per event")
    // each window's count equals the events in [ws, ws+2h)
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts"))
      .as[(String, java.sql.Timestamp)].collect()
    got.take(30).foreach { case (ws, et, n) =>
      val lo = ws.getTime; val hi = lo + 2 * 3600 * 1000L
      val expect = ev.count(r => r._1 == et &&
        r._2.getTime >= lo && r._2.getTime < hi)
      assert(n == expect, s"window $ws/$et")
    }
  }
}
