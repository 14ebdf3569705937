package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-13 operators: sentence reassembly,
  * star-except schema, ORDER BY ALL determinism, null-safe join
  * conservation.
  */
class Extras16Spec extends SparkSpec {

  test("sentences: per-doc char totals conserve (minus removed separators)") {
    import spark.implicits._
    val got = SparkEntry.queries("text_sentences")(spark, sf0001)
      .as[(Long, Long, String, Long)].collect()
    assert(got.nonEmpty)
    val docs = graft.io.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    got.groupBy(_._1).foreach { case (id, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (0L until rows.length).toSeq,
        s"doc $id contiguous indices")
      // re-joining with single spaces reproduces the original text with
      // inter-sentence whitespace normalized
      val rejoined = ordered.map(_._3).mkString(" ")
      val normalized = docs(id).replaceAll("([.!?])\\s+", "$1 ")
      assert(rejoined == normalized, s"doc $id reassembly")
      rows.foreach(r => assert(r._4 == r._3.length))
    }
  }

  test("sentence splitter handles real multi-sentence text (literal input)") {
    import spark.implicits._
    // the synthetic corpus has no punctuation, so exercise the
    // boundary regex on literal text too
    val df = Seq((1L, "One. Two!  Three? Four"), (2L, "No boundary here"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        posexplode(split(
          regexp_replace(col("text"), "([.!?])\\s+", "$1\u0001"), "\u0001")))
      .select(col("doc_id"), col("pos"), col("col")).as[(Long, Int, String)]
      .collect().groupBy(_._1)
    assert(got(1L).sortBy(_._2).map(_._3).toSeq ==
      Seq("One.", "Two!", "Three?", "Four"))
    assert(got(2L).map(_._3).toSeq == Seq("No boundary here"))
  }

  test("star except: schema drops exactly the excluded column") {
    val got = SparkEntry.queries("sql_star_except")(spark, sf0001)
    val full = graft.io.Tables.documents(spark, sf0001)
    assert(got.columns.toSeq == full.columns.filterNot(_ == "text").toSeq)
    assert(got.count() == full.count())
  }

  test("order by all: rows arrive fully sorted by every column in order") {
    import spark.implicits._
    val got = SparkEntry.queries("sql_order_by_all")(spark, sf0001)
      .as[(String, Int, Long)].collect()
    assert(got.nonEmpty)
    val sorted = got.sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == sorted.toSeq)
  }

  test("null-safe join: every customer matches exactly one zone; delinquents map to DELINQUENT") {
    import spark.implicits._
    val got = SparkEntry.queries("join_null_safe")(spark, sf0001)
      .as[(Long, String)].collect()
    val cust = graft.io.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), (col("c_acctbal") < 0).as("neg"),
        (col("c_nationkey") % 5).as("bk"))
      .as[(Long, Boolean, Int)].collect()
    assert(got.length == cust.length, "null-safe join conserves the fact")
    val byKey = got.map(r => r._1 -> r._2).toMap
    cust.foreach { case (ck, neg, bk) =>
      assert(byKey(ck) == (if (neg) "DELINQUENT" else s"ZONE_$bk"), s"cust $ck")
    }
    assert(got.exists(_._2 == "DELINQUENT"), "NULL-NULL match path fires")
  }
}
