package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-11 operators: referential totals and
  * firing contract, quantization code bounds and extremes, unpivot row
  * conservation, new/returning partition of weekly actives.
  */
class Extras14Spec extends SparkSpec {

  test("referential: totals equal fact count; strict FK clean, contract fires") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_referential")(spark, sf0001)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val n = graft.io.Tables.orders(spark, sf0001).count()
    assert(got("orders->customer") == (n, 0L), "strict FK is clean")
    assert(got("orders->active_customer")._1 == n)
    assert(got("orders->active_customer")._2 > 0, "business contract fires")
  }

  test("quantize: codes in [0,255]; per-dim min maps to 0 and max to 255") {
    import spark.implicits._
    val got = SparkEntry.queries("emb_quantize")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    val codes = got.flatMap(r => Seq(r._2, r._3, r._4, r._5))
    assert(codes.forall(c => c >= 0 && c <= 255))
    Seq[((Long, Long, Long, Long, Long)) => Long](_._2, _._3, _._4, _._5)
      .foreach { dim =>
        assert(got.map(dim).min == 0 && got.map(dim).max == 255,
          "extremes hit the code range ends")
      }
  }

  test("unpivot multi: 2 rows per lineitem; values match the pivoted source") {
    import spark.implicits._
    val got = SparkEntry.queries("sql_unpivot_multi")(spark, sf0001)
      .as[(Long, Int, String, Long, Long)].collect()
    val li = graft.io.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_quantity*100) AS BIGINT)"),
        expr("CAST(round(l_extendedprice*100) AS BIGINT)"),
        expr("CAST(round(l_discount*100) AS BIGINT)"),
        expr("CAST(round(l_tax*100) AS BIGINT)"))
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(got.length == 2 * li.length)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // compare as multisets per measure group
    def sortedBag(rs: Seq[(Long, Int, Long, Long)]) = rs.sorted
    val gq = got.filter(_._3 == "qty_price").map(r => (r._1, r._2, r._4, r._5)).toSeq
    val gd = got.filter(_._3 == "disc_tax").map(r => (r._1, r._2, r._4, r._5)).toSeq
    assert(sortedBag(gq) == sortedBag(li.map(r => (r._1, r._2, r._3, r._4)).toSeq))
    assert(sortedBag(gd) == sortedBag(li.map(r => (r._1, r._2, r._5, r._6)).toSeq))
  }

  test("new vs returning: partitions weekly actives; first week is all-new") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_new_returning")(spark, sf0001)
      .as[(java.sql.Timestamp, Long, Long)].collect().sortBy(_._1.getTime)
    assert(got.nonEmpty)
    assert(got.head._3 == 0, "nobody returns in the first week")
    val weekly = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
      .groupBy("wk").count()
      .as[(java.sql.Timestamp, Long)].collect().toMap
    got.foreach { case (wk, nw, rt) =>
      assert(nw + rt == weekly(wk), s"week $wk partition")
    }
    val users = graft.io.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(got.map(_._2).sum == users, "every user is new exactly once")
  }
}
