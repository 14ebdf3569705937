package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-17 operators: PSI bucket/half
  * conservation and smoothed-term recompute, time-to-convert bounds.
  */
class Extras20Spec extends SparkSpec {

  test("psi: 10 buckets; halves partition events; terms recompute; total >= 0") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_psi")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == (1L to 10L).toSeq)
    val total = graft.io.Tables.events(spark, sf0001).count()
    assert(got.map(r => r._2 + r._3).sum == total, "halves partition")
    val (n1, n2) = (got.map(_._2).sum, got.map(_._3).sum)
    got.foreach { case (bk, c1, c2, t6) =>
      val p = (c1 + 1).toDouble / (n1 + 10)
      val q = (c2 + 1).toDouble / (n2 + 10)
      assert(t6 == math.round((p - q) * math.log(p / q) * 1e6), s"bucket $bk")
    }
    // each term (p−q)·ln(p/q) is non-negative: same sign factors
    got.foreach(r => assert(r._4 >= 0, s"bucket ${r._1} term sign"))
  }

  test("time to convert: 0 <= med <= p90 <= max; count bounded by purchases") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_time_to_convert")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n, med, p90, mx) = got.head
    assert(n > 0 && med >= 0 && med <= p90 && p90 <= mx)
    val purchases = graft.io.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(n <= purchases)
  }
}
