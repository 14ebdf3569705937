package graft

import org.apache.spark.sql.functions._

/** Wave-50: interval algebra invariants. */
class Extras50Spec extends SparkSpec {

  test("max concurrent: ≥1 for every part with a shipment, ≤ its lineitem count") {
    val got = SparkEntry.queries("ts_max_concurrent")(spark, sf0001)
    val perPart = graft.io.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    val joined = got.join(perPart, "l_partkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val mc = r.getAs[Long]("max_concurrent")
      assert(mc >= 1 && mc <= r.getAs[Long]("n"))
    }
  }

  test("interval merge: islands bounded by intervals; coverage ≥ longest transit") {
    val got = SparkEntry.queries("ts_interval_merge")(spark, sf0001)
    val perSupp = graft.io.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val joined = got.join(perSupp, "l_suppkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val isl = r.getAs[Long]("n_islands")
      assert(isl >= 1 && isl <= r.getAs[Long]("n"))
      // each island spans ≥ 2 days (transit ≥ 1), so coverage ≥ 2·islands
      assert(r.getAs[Long]("covered_days") >= 2 * isl)
    }
  }
}
