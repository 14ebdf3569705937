package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-12 operators: count-min overcount
  * contract, pivot-multi agreement with conditional aggregation, file
  * sink streaming/batch parity.
  */
class Extras15Spec extends SparkSpec {

  test("countmin: est >= exact for every key (structural CMS contract)") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_countmin")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (k, exact, est) =>
      assert(est >= exact, s"key $k: CMS can only overcount")
    }
    val total = graft.io.Tables.events(spark, sf0001).count()
    got.foreach { case (k, _, est) =>
      assert(est <= total, s"key $k: estimate bounded by stream length")
    }
  }

  test("pivot multi == conditional aggregation recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("sql_pivot_multi")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val raw = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)"))
      .as[(String, String, Long)].collect()
    got.foreach { case (pr, fn, fc, on, oc, pn, pc) =>
      def cell(st: String) = raw.filter(r => r._1 == pr && r._2 == st)
      assert(fn == cell("F").length && fc == cell("F").map(_._3).sum, s"$pr F")
      assert(on == cell("O").length && oc == cell("O").map(_._3).sum, s"$pr O")
      assert(pn == cell("P").length && pc == cell("P").map(_._3).sum, s"$pr P")
    }
    assert(got.map(r => r._2 + r._4 + r._6).sum == raw.length,
      "cells partition the fact")
  }

  test("streaming parquet file sink == append-mode windows, exactly once") {
    import spark.implicits._
    val got = SparkEntry.queries("stream_file_sink")(spark, sf0001)
      .as[(java.sql.Timestamp, Long)].collect().toSet
    val append = graft.streaming.Streams.hourlyEventAggAppend(spark, sf0001)
      .as[(java.sql.Timestamp, Long)].collect().toSet
    assert(got == append, "file sink emits the same closed windows")
    assert(got.nonEmpty)
  }
}
