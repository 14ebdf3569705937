package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-22 operators: flatline run
  * consistency, Zipf slope sign and recompute.
  */
class Extras24Spec extends SparkSpec {

  test("flatline: runs fire, are maximal, and contain one band only") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_flatline")(spark, sf0001)
      .as[(Long, Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
    assert(got.nonEmpty, "banded flatline path fires on this data")
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value/10) AS BIGINT)"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    got.foreach { case (u, _, band, len, start, end) =>
      assert(len >= 3)
      assert(!start.after(end))
      // the run's span in the raw series is exactly `len` events of `band`
      val series = ev.filter(_._1 == u).sortBy(r => (r._2.getTime, r._3))
      val inSpan = series.filter(r => !r._2.before(start) && !r._2.after(end))
      assert(inSpan.count(_._4 == band) >= len, s"user $u run span")
    }
  }

  test("zipf: slope is negative (frequencies decay in rank); recomputes") {
    import spark.implicits._
    val got = SparkEntry.queries("text_zipf_fit")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n, slope, intercept) = got.head
    assert(slope < 0, "Zipf slope must be negative")
    val cf = graft.io.Tables.documents(spark, sf0001)
      .select(explode(split(lower(trim(col("text"))), " +")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect()
    assert(n == cf.length)
    val ranked = cf.sortBy(r => (-r._2, r._1)).zipWithIndex
      .map { case ((_, c), i) =>
        (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6)) }
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxy = ranked.map(p => BigInt(p._1) * p._2).sum.toDouble
    val sxx = ranked.map(p => BigInt(p._1) * p._1).sum.toDouble
    val slopeExp = (n.toDouble * sxy - sx.toDouble * sy) /
      (n.toDouble * sxx - sx.toDouble * sx)
    assert(slope == math.round(slopeExp * 1e6), "slope recompute")
    assert(intercept == math.round((sy.toDouble - slopeExp * sx) / n),
      "intercept recompute")
  }
}
