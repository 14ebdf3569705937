package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-28 operators: skyline dominance,
  * Mann-Kendall pair accounting, multiline roundtrip fidelity.
  */
class Extras30Spec extends SparkSpec {

  test("skyline: members dominate or tie everyone; non-members are dominated") {
    import spark.implicits._
    val sky = SparkEntry.queries("analytics_skyline")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(sky.nonEmpty)
    val all = graft.io.Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice*100) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    def dominated(x: (Long, Long, Long)) = all.exists(b =>
      b._2 >= x._2 && b._3 >= x._3 && (b._2 > x._2 || b._3 > x._3))
    sky.foreach(m => assert(!dominated(m), s"skyline member ${m._1}"))
    val skySet = sky.map(_._1).toSet
    all.filterNot(r => skySet(r._1)).foreach(r =>
      assert(dominated(r), s"non-member ${r._1} must be dominated"))
  }

  test("mann-kendall: |S| <= n(n-1)/2; trend label matches sign") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_mann_kendall")(spark, sf0001)
      .as[(Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, nI, sStat, trend) =>
      val n = nI + 1 // max over a-side indices = n-1 pairs partner
      assert(math.abs(sStat) <= n * (n - 1) / 2, s"user $u bound")
      assert(trend == (if (sStat > 0) "up" else if (sStat < 0) "down" else "flat"))
    }
    assert(got.exists(_._4 == "up") || got.exists(_._4 == "down"),
      "some series actually trend")
  }

  test("multiline csv: embedded newlines survive the roundtrip") {
    import spark.implicits._
    val back = SparkEntry.queries("src_csv_multiline")(spark, sf0001)
      .as[(Long, String)].collect()
    val direct = graft.io.Tables.customer(spark, sf0001)
      .select(col("c_custkey"),
        concat(col("c_name"), lit("\n"), col("c_mktsegment")))
      .as[(Long, String)].collect()
    assert(back.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
    assert(back.forall(_._2.contains("\n")), "newlines preserved in every field")
  }
}
