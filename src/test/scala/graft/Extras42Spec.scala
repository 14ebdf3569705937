package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-40 operators. */
class Extras42Spec extends SparkSpec {

  test("corr matrix: 6 pairs, bounded, price~qty strongly positive") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_corr_matrix")(spark, sf0001)
      .as[(String, String, Long)].collect()
    assert(got.length == 6)
    assert(got.forall(r => r._3 >= -1000000L && r._3 <= 1000000L))
    // every cell agrees with Spark's own corr() on the same cents
    val pairs = Map("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "discount" -> "l_discount", "tax" -> "l_tax")
    got.foreach { case (a, b, cE6) =>
      val ref = graft.io.Tables.lineitem(spark, sf0001)
        .select(corr(expr(s"round(${pairs(a)} * 100)"),
          expr(s"round(${pairs(b)} * 100)")).as("c"))
        .as[Double].head()
      assert(math.abs(cE6 - ref * 1e6) <= 2, s"$a~$b: $cE6 vs functions.corr $ref")
    }
  }

  test("interpurchase: gaps positive and ordered; counts match repeat customers") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_interpurchase")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    val perCust = graft.io.Tables.orders(spark, sf0001)
      .groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    assert(got.length == perCust.count(_._2 >= 2), "one row per repeat customer")
    got.foreach { case (c, nGaps, avg, mn, mx) =>
      assert(nGaps == perCust(c) - 1, s"cust $c gap count")
      assert(mn >= 0 && mn <= avg && avg <= mx, s"cust $c ordering")
    }
  }
}
