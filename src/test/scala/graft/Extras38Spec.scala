package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-36 operators. */
class Extras38Spec extends SparkSpec {

  test("biggest jump: is the max |delta| of the raw series at the right event") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_biggest_jump")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value*100) AS BIGINT)"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    got.foreach { case (u, jump, eid) =>
      val series = ev.filter(_._1 == u).sortBy(r => (r._2.getTime, r._3))
      val deltas = series.sliding(2).filter(_.length == 2)
        .map(p => (math.abs(p(1)._4 - p(0)._4), p(1)._3)).toSeq
      assert(jump == deltas.map(_._1).max, s"user $u magnitude")
      // the reported event carries that magnitude
      assert(deltas.contains((jump, eid)), s"user $u location")
    }
  }

  test("chunk dedup: survivors unique by text; copies conserve raw chunk count") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_chunks")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val rawChunks = SparkEntry.queries("text_chunks")(spark, sf0001).count()
    assert(got.map(_._3).sum == rawChunks, "copy counts partition raw chunks")
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
    assert(got.exists(_._3 > 1), "duplicate chunks exist in this corpus")
  }
}
