package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-31 operators. */
class Extras33Spec extends SparkSpec {

  test("mapGroups: span/count agree with the aggregate recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("typed_map_groups")(spark, sf0001)
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    val agg = graft.io.Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg((max("l_quantity") - min("l_quantity")).as("span"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
    agg.foreach { case (rf, span, n) =>
      assert(got(rf)._2 == span && got(rf)._3 == n, s"flag $rf")
    }
  }

  test("k-anonymity: classes partition the table; both flag values occur") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_k_anonymity")(spark, sf0001)
      .as[(String, Int, Long, Boolean)].collect()
    assert(got.map(_._3).sum == graft.io.Tables.customer(spark, sf0001).count())
    got.foreach(r => assert(r._4 == (r._3 < 5)))
    assert(got.exists(_._4) && got.exists(!_._4),
      "some classes violate k=5 and some satisfy it on this data")
  }
}
