package graft

import org.apache.spark.sql.functions._

/** Invariant of the round-4 wave-34 operator: gap accounting. */
class Extras36Spec extends SparkSpec {

  test("id gaps: ranges well-formed; total missing reconciles with span minus count") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_id_gaps")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "the F-status partition has holes by construction")
    got.foreach { case (a, b, n) =>
      assert(a <= b && n == b - a + 1, s"gap [$a,$b]")
    }
    val ks = graft.io.Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").as[Long].collect()
    assert(got.map(_._3).sum == (ks.max - ks.min + 1) - ks.length,
      "missing IDs reconcile exactly")
  }
}
