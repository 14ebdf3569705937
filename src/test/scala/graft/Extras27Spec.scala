package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-25 operators: script profile
  * consistency with the lang column, recursive read completeness.
  */
class Extras27Spec extends SparkSpec {

  test("script profile: share bounds hold; dominant matches the counts") {
    import spark.implicits._
    val got = SparkEntry.queries("text_script_profile")(spark, sf0001)
      .as[(Long, Long, Long, Option[Long], String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, cjk, latin, share, dom) =>
      share.foreach(v => assert(v >= 0 && v <= 1000000L, s"doc $id share"))
      assert(dom == (if (cjk > latin) "cjk" else "latin"))
    }
  }

  test("script detector fires on real CJK text (literal input — the corpus is all Latin)") {
    import spark.implicits._
    val df = Seq((1L, "机器学习 是 人工智能 ml"), (2L, "pure latin text"))
      .toDF("doc_id", "text")
    val cjk = size(expr("regexp_extract_all(text, '[\\u4e00-\\u9fff]', 0)"))
      .cast("long")
    val latin = size(expr("regexp_extract_all(text, '[A-Za-z]', 0)")).cast("long")
    val got = df.select(col("doc_id"), cjk.as("c"), latin.as("l"),
        when(cjk > latin, "cjk").otherwise("latin").as("dom"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 9 && got(1L)._4 == "cjk")
    assert(got(2L)._2 == 0 && got(2L)._4 == "latin")
  }

  test("recursive read: both nested feeds land; nothing duplicated or lost") {
    val src = graft.io.Tables.customer(spark, sf0001)
    val back = SparkEntry.queries("src_recursive")(spark, sf0001)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
