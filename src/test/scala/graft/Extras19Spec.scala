package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-16 operators: incremental SCD-2
  * equals full recompute (the core split-invariance), LTV monotonicity
  * and cohort conservation.
  */
class Extras19Spec extends SparkSpec {

  test("scd2_apply == full scd2 recompute (split invariance)") {
    val inc = SparkEntry.queries("scd2_apply")(spark, sf0001).collect()
    val full = SparkEntry.queries("scd2_intervals")(spark, sf0001).collect()
    assert(inc.map(_.toString).sorted.toSeq == full.map(_.toString).sorted.toSeq)
    assert(inc.nonEmpty)
  }

  test("ltv: cumulative is monotone per cohort; offset-0 exists for every cohort") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_ltv")(spark, sf0001)
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (cohort, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.head._2 == 0, s"cohort $cohort starts at offset 0")
      ordered.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1)._4 >= p(0)._4, s"cohort $cohort cumulative monotone")
      }
      // cum at each offset = sum of cents up to it
      ordered.foldLeft(0L) { (acc, r) =>
        val cum = acc + r._3
        assert(r._4 == cum, s"cohort $cohort offset ${r._2} cum")
        assert(r._6 == math.round(cum.toDouble / r._5))
        cum
      }
    }
    val users = graft.io.Tables.orders(spark, sf0001)
      .select("o_custkey").distinct().count()
    assert(got.groupBy(_._1).map(_._2.head._5).sum == users,
      "cohort sizes partition the customer base")
  }
}
