package graft

import org.apache.spark.sql.functions._

/** Invariant of the round-4 wave-45 operator. */
class Extras47Spec extends SparkSpec {

  test("rank movement: ranks are permutations; delta consistent; revenue matches") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_rank_movement")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, rp, rc, delta) =>
      assert(delta == rp - rc)
      assert(rp >= 1 && rc >= 1)
    }
    // rank_cur values are distinct (row_number is a total order)
    assert(got.map(_._5).distinct.length == got.length)
    // revenue agrees with a direct recompute for the top mover
    val (cust, revPrev, revCur, _, _, _) = got.maxBy(_._6)
    val rev = graft.io.Tables.orders(spark, sf0001)
      .filter(col("o_custkey") === cust)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("r"))
      .as[(Int, Long)].collect().toMap
    assert(rev(1997) == revPrev && rev(1998) == revCur)
    // higher current revenue never ranks worse than lower
    val sorted = got.sortBy(_._5)
    sorted.sliding(2).foreach {
      case Array(x, y) => assert(x._3 >= y._3 || x._5 < y._5)
      case _ =>
    }
  }
}
