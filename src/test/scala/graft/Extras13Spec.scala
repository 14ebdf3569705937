package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-10 operators: bloom prefilter equals
  * the plain anti join (pure shuffle avoidance), existence-mark flag
  * agreement, JSON roundtrip fidelity, streaming global-agg parity.
  */
class Extras13Spec extends SparkSpec {

  test("bloom prefilter == plain exact anti join; both paths contribute") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_bloom_prefilter")(spark, sf0001)
      .as[Long].collect().toSet
    val docs = graft.io.Tables.documents(spark, sf0001)
      .withColumn("fp", md5(lower(trim(col("text")))))
    val evalFp = docs.filter(col("doc_id") % 10 === 0)
      .select("fp").as[String].collect().toSet
    val expect = docs.filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "fp").as[(Long, String)].collect()
      .filterNot(r => evalFp(r._2)).map(_._1).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("existence mark: one row per customer; flag == semi-join membership") {
    import spark.implicits._
    val got = SparkEntry.queries("join_existence_mark")(spark, sf0001)
      .as[(Long, Boolean)].collect()
    val nCust = graft.io.Tables.customer(spark, sf0001).count()
    assert(got.length == nCust, "mark join conserves the left side")
    val urgent = graft.io.Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").as[Long].collect().toSet
    got.foreach { case (ck, flag) => assert(flag == urgent(ck), s"cust $ck") }
    assert(got.exists(_._2) && got.exists(!_._2), "both mark values occur")
  }

  test("json sink roundtrip preserves every row and double bit pattern") {
    val src = graft.io.Tables.customer(spark, sf0001)
    val back = SparkEntry.queries("sink_json")(spark, sf0001)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("streaming global agg == batch per-type totals") {
    import spark.implicits._
    val streamed = SparkEntry.queries("stream_global_agg")(spark, sf0001)
      .as[(String, Long, Long)].collect().toSet
    val batch = graft.io.Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value*100) AS BIGINT)")).cast("long").as("cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
