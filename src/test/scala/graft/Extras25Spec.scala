package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-23 operators: stickiness bounds,
  * dormancy flag consistency.
  */
class Extras25Spec extends SparkSpec {

  test("stickiness: in (0, 1e6]; dau_total/days <= mau structurally") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_stickiness")(spark, sf0001)
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (mon, dauTot, nDays, mau, s6) =>
      assert(dauTot >= mau, s"$mon: every monthly active has >= 1 active day")
      assert(dauTot <= nDays * mau, s"$mon: avg DAU cannot exceed MAU")
      assert(s6 > 0 && s6 <= 1000000L, s"$mon bounds")
      assert(s6 == math.round(dauTot.toDouble / nDays / mau * 1e6))
    }
  }

  test("dormancy: flag matches the 14-day rule; most recent user is not dormant") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_dormancy")(spark, sf0001)
      .as[(Long, java.sql.Timestamp, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, _, days, dormant) =>
      assert(days >= 0, s"user $u non-negative silence")
      assert(dormant == (days > 14), s"user $u flag")
    }
    assert(got.exists(_._3 == 0), "the high-water-mark user is current")
    val nUsers = graft.io.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(got.length == nUsers)
  }
}
