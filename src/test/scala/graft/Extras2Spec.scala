package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-2 operators on small/literal inputs plus
  * sf0.001 invariants. */
class Extras2Spec extends SparkSpec {
  import spark.implicits._

  test("recursive CTE spine has exactly 12 months, all 1995") {
    val rows = Registry.all.find(_.name == "sql_recursive_cte").get
      .fn(spark, sf0001).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getDate(0).toString.take(4)).forall(_ == "1995"))
    // densification: every spine month survives even with zero orders
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("intersectAll keeps min multiplicity, exceptAll the surplus") {
    val a = Seq("x", "x", "x", "y").toDF("v")
    val b = Seq("x", "x", "z").toDF("v")
    assert(a.intersectAll(b).collect().map(_.getString(0)).sorted
      .toSeq == Seq("x", "x"))
    assert(a.exceptAll(b).collect().map(_.getString(0)).sorted
      .toSeq == Seq("x", "y"))
  }

  test("full outer join keeps customers without orders and orphan orders") {
    val c = Seq((1L, "A"), (2L, "B")).toDF("ck", "seg")
    val o = Seq((10L, 1L), (11L, 9L)).toDF("ok", "ck2")
    val j = c.join(o, col("ck") === col("ck2"), "full_outer")
    assert(j.count() == 3) // matched, customer-only, order-only
    assert(j.filter(col("ok").isNull).count() == 1)
    assert(j.filter(col("ck").isNull).count() == 1)
  }

  test("emb_norm rows have (close to) unit L2 norm after unscaling") {
    val rows = Registry.all.find(_.name == "emb_norm").get
      .fn(spark, sf0001).limit(5).collect()
    // 4 of 64 dims only — each component must sit in [-1e6, 1e6]
    rows.foreach { r =>
      (1 to 4).foreach(i => assert(math.abs(r.getLong(i)) <= 1000000L))
    }
  }

  test("range search returns exactly the vectors the brute-force scan ranks above the radius") {
    val emb = io.Tables.embeddings(spark, sf0001)
    val hits = sim.Similarity.rangeSearch(emb, 0.3)
      .select("vec_id").as[Long].collect().toSet
    val all = sim.Similarity.bruteForceTopK(emb, emb.count().toInt)
      .filter(col("cos_sim") >= 0.3).select("vec_id").as[Long].collect().toSet
    assert(hits == all && hits.nonEmpty)
  }

  test("bigram counts: literal check through the shared shipped expression") {
    val df = Seq("a b a b", "a b", "solo").toDF("text")
    val bigrams = df
      .select(explode(text.TextAnalysis.bigramsCol(col("text"))).as("bg"))
      .groupBy("bg").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigrams == Map("a b" -> 3L, "b a" -> 1L))
  }

  test("tfidf ranks are deterministic and respect the rounded-integer ordering") {
    val out = Registry.all.find(_.name == "text_tfidf").get.fn(spark, sf0001)
    val rows = out.collect()
    // exactly ≤3 rows per doc, rn strictly increasing, tfidf non-increasing per doc
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getLong(3))
      assert(byRn.map(_.getLong(3)).toSeq == (1L to byRn.length))
      val vals = byRn.map(_.getLong(2)).toSeq
      assert(vals == vals.sorted.reverse)
    }
  }

  test("quality gate output is a strict, non-empty subset keyed to en docs") {
    val kept = Registry.all.find(_.name == "pipeline_quality_gate").get
      .fn(spark, sf0001).as[Long].collect().toSet
    val docs = io.Tables.documents(spark, sf0001)
    assert(kept.nonEmpty && kept.size < docs.count())
    // every kept doc must classify as en
    val langs = docs.select(col("doc_id"),
      text.TextAnalysis.langId(col("text")).as("lp"))
      .filter(col("doc_id").isin(kept.toSeq: _*))
      .select("lp").distinct().as[String].collect().toSeq
    assert(langs == Seq("en"))
  }

  test("dropDuplicatesWithinWatermark emits each key once") {
    val counts = streaming.Streams.dedupedWithinWatermarkCounts(spark, sf0001)
    val plain = io.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("event_id").as("n"))
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
