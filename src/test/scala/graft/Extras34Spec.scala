package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-32 operators. */
class Extras34Spec extends SparkSpec {

  test("eta squared: in [0, 1e6]; recomputes from group sums") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_eta_squared")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(got.length == 1)
    val (nt, eta6) = got.head
    assert(eta6 >= 0 && eta6 <= 1000000L)
    val raw = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), expr("CAST(round(o_totalprice*100) AS BIGINT)"))
      .as[(String, Long)].collect()
    assert(nt == raw.length)
    val groups = raw.groupBy(_._1).values.map(_.map(_._2))
    val ssqt = raw.map(r => BigInt(r._2) * r._2).sum.toDouble
    val st = raw.map(_._2).sum
    val sgrp = groups.map(g => g.sum.toDouble * g.sum / g.length).sum
    val expect = 1 - (ssqt - sgrp) / (ssqt - st.toDouble * st / nt)
    assert(eta6 == math.round(expect * 1e6), "eta recompute")
  }

  test("reconciliation: every partition matches source exactly") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_reconciliation")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (st, nSrc, cSrc, nSink, cSink, ok) =>
      assert(ok && nSrc == nSink && cSrc == cSink, s"partition $st")
    }
    assert(got.map(_._2).sum == graft.io.Tables.orders(spark, sf0001).count())
  }
}
