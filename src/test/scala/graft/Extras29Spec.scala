package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-27 operators: time-in-state
  * conservation, corrupt-record accounting.
  */
class Extras29Spec extends SparkSpec {

  test("time in state: per-user totals sum to the user's observed span") {
    import spark.implicits._
    val got = SparkEntry.queries("scd2_time_in_state")(spark, sf0001)
      .as[(Long, String, Long, Long)].collect()
    assert(got.nonEmpty)
    val maxUs = graft.io.Tables.events(spark, sf0001)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val spans = graft.io.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("first"))
      .as[(Long, Long)].collect().toMap
    got.groupBy(_._1).foreach { case (u, rows) =>
      val expect = maxUs - spans(u)
      assert(rows.map(_._3).sum == expect,
        s"user $u: state durations partition the observed span")
      assert(rows.forall(_._4 >= 1))
    }
  }

  test("corrupt json: all real rows good, exactly the 3 staged bad lines corrupt") {
    import spark.implicits._
    val got = SparkEntry.queries("src_json_corrupt")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(got.length == 1)
    val (good, corrupt) = got.head
    assert(good == graft.io.Tables.events(spark, sf0001).count())
    assert(corrupt == 3)
  }
}
