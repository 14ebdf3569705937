package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-4 operators beyond the DuckDB hash
  * gate: peak selection maximality, entropy bounds + exact per-term
  * rounding, lateral-join equivalence to a window top-k. */
class Extras7Spec extends SparkSpec {

  test("downsample keeps exactly one row per populated (user, hour), the max-deviation one") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_downsample_peaks")(spark, sf0001)
      .as[(Long, java.sql.Timestamp, Long, Long, Long)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
        col("ts"), col("event_id"), round(col("value") * 1e6).cast("long").as("v6"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)].collect()
    val buckets = ev.groupBy(r => (r._1, r._2))
    assert(got.length == buckets.size)
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    buckets.foreach { case (k, rows) =>
      val (_, _, eid, v6, n) = byKey(k)
      assert(n == rows.length)
      val s6 = rows.map(_._5).sum
      val maxDev = rows.map(r => (r._5 * rows.length - s6).abs).max
      val kept = rows.find(_._4 == eid).get
      assert((kept._5 * rows.length - s6).abs == maxDev, s"bucket=$k")
      assert(v6 == kept._5)
    }
  }

  test("entropy is in [0, ln(buckets)] and matches an exact scala recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_entropy")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    val counts = graft.io.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), hour(col("ts")).as("hh")).count()
      .as[(String, Int, Long)].collect().groupBy(_._1)
    got.foreach { case (et, n, nb, cln6, h6) =>
      val cs = counts(et).map(_._3)
      assert(n == cs.sum && nb == cs.length)
      val expCln6 = cs.map(c => c * math.round(math.log(c.toDouble) * 1e6)).sum
      assert(cln6 == expCln6, s"$et cln6")
      val expH6 = math.round((math.log(n.toDouble) - cln6 / (n * 1e6)) * 1e6)
      assert(h6 == expH6, s"$et entropy")
      assert(h6 >= 0 && h6 <= math.round(math.log(nb.toDouble) * 1e6) + 1)
    }
  }

  test("lateral top-2 equals the window row_number spelling") {
    import spark.implicits._
    val lat = SparkEntry.queries("sql_lateral_correlated")(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_name"))
    val win = graft.io.Tables.customer(spark, sf0001)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(graft.io.Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(lat == win && lat.nonEmpty)
  }

  test("identifier binding hits the same table as the literal reference") {
    val a = SparkEntry.queries("sql_identifier_clause")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val b = graft.io.Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name").orderBy("n_nationkey")
      .collect().map(_.toString).toSeq
    assert(a == b)
  }
}
