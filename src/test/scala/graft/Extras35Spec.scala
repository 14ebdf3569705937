package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-33 operators. */
class Extras35Spec extends SparkSpec {

  test("cross-table asof: resolved order predates the probe; is the latest such") {
    import spark.implicits._
    val got = SparkEntry.queries("join_asof_cross_table")(spark, sf0001)
      .as[(Long, Long, Option[Long])].collect()
    assert(got.nonEmpty && got.exists(_._3.isDefined))
    val orders = graft.io.Tables.orders(spark, sf0001)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect().groupBy(_._1)
    val probes = graft.io.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select("event_id", "ts").as[(Long, java.sql.Timestamp)].collect().toMap
    got.foreach { case (eid, uid, lok) =>
      val t = probes(eid).getTime
      val prior = orders.getOrElse(uid, Array.empty)
        .filter(_._3.getTime <= t)
      lok match {
        case Some(k) =>
          val maxDate = prior.map(_._3.getTime).max
          val expect = prior.filter(_._3.getTime == maxDate).map(_._2).max
          assert(k == expect, s"event $eid")
        case None => assert(prior.isEmpty, s"event $eid should have matched")
      }
    }
  }

  test("duplicate keys: report lists exactly the multi-copy natural keys") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_duplicate_keys")(spark, sf0001)
      .as[(Long, Int, Long)].collect()
    assert(got.nonEmpty, "the synthetic feed does contain duplicate keys")
    got.foreach(r => assert(r._3 >= 2))
    val li = graft.io.Tables.lineitem(spark, sf0001).count()
    val distinctKeys = graft.io.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber").distinct().count()
    assert(got.map(_._3 - 1).sum == li - distinctKeys,
      "excess copies reconcile with the distinct-key gap")
  }
}
