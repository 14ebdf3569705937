package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-19 operators: point-in-time version
  * validity, AM ≥ GM ≥ HM ordering, count-encoding conservation.
  */
class Extras22Spec extends SparkSpec {

  test("pit lookup: resolved version was valid at the probe timestamp") {
    import spark.implicits._
    val got = SparkEntry.queries("join_pit_scd2")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val scd = SparkEntry.queries("scd2_intervals")(spark, sf0001)
      .select("user_id", "version", "valid_from", "valid_to")
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().groupBy(_._1)
    val probes = graft.io.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    got.foreach { case (eid, uid, v) =>
      val t = probes(eid).getTime
      val iv = scd(uid).find(_._2 == v).get
      assert(iv._3.getTime <= t, s"event $eid: version starts before probe")
      assert(iv._4.forall(_.getTime > t), s"event $eid: version still open at probe")
    }
  }

  test("pythagorean means: AM >= GM >= HM per priority (within rounding)") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_pythagorean_means")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (pri, n, am, gm, hm) =>
      assert(n > 0 && hm > 0)
      assert(am + 1 >= gm && gm + 1 >= hm, s"$pri mean ordering")
    }
  }

  test("count encoding: every row keeps its segment count; shares sum to 1e6") {
    import spark.implicits._
    val got = SparkEntry.queries("feature_count_encode")(spark, sf0001)
      .as[(Long, String, Long, Long)].collect()
    val bySeg = got.groupBy(_._2)
    bySeg.foreach { case (seg, rows) =>
      assert(rows.forall(_._3 == rows.length), s"$seg count consistency")
    }
    val shareSum = bySeg.map(_._2.head._4).sum
    assert(math.abs(shareSum - 1000000L) <= bySeg.size, "shares sum to ~1e6")
    assert(got.length == got.map(_._1).distinct.length, "one row per customer")
  }
}
