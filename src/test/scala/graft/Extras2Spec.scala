package graft

import org.apache.spark.sql.functions._

/** Semantics of the round-2 operators on small/literal inputs plus
  * sf0.001 invariants. */
class Extras2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

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

  test("train/test split is deterministic, total, and roughly 13/16 train") {
    val q = Registry.all.find(_.name == "split_train_test").get
    val a = q.fn(spark, sf0001).collect().map(r => r.getLong(0) -> r.getString(1))
    val b = q.fn(spark, sf0001).collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.toSeq == b.toSeq) // rerun-stable
    val frac = a.count(_._2 == "train").toDouble / a.length
    assert(frac > 0.6 && frac < 0.95) // 13 of 16 hex buckets ≈ 0.8125
  }

  test("null-safe equality: <=> treats NULL = NULL as true, = as unknown") {
    val df = Seq((Some("x"), Some("x")), (None, None), (Some("x"), None))
      .toDF("a", "b")
    val r = df.select((col("a") <=> col("b")).as("nse"),
      (col("a") === col("b")).as("eq")).collect()
    assert(r.map(_.getBoolean(0)).toSeq == Seq(true, true, false))
    assert(r.map(x => Option(x.get(1))).toSeq == Seq(Some(true), None, None))
  }

  test("xml round-trip extracts the embedded value") {
    val rows = Registry.all.find(_.name == "xml_funcs").get
      .fn(spark, sf0001).limit(50).collect()
    val ev = io.Tables.events(spark, sf0001)
      .select("event_id", "user_id").limit(50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == ev(r.getLong(0))))
  }

  test("forward as-of picks the earliest view at-or-after (ties inclusive)") {
    val events = Seq(
      (1L, 10L, ts("2024-01-10 00:00:00"), "purchase"),
      (2L, 10L, ts("2024-01-10 00:00:00"), "view"), // same instant → counts
      (3L, 10L, ts("2024-01-12 00:00:00"), "view"),
      (4L, 20L, ts("2024-01-10 00:00:00"), "purchase") // no view after → null
    ).toDF("event_id", "user_id", "ts", "event_type")
    val p = events.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), col("event_id"),
      lit(null).cast("timestamp").as("v_ts"), lit(1).as("is_probe"))
    val v = events.filter(col("event_type") === "view").select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast("long").as("event_id"),
      col("ts").as("v_ts"), lit(0).as("is_probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("t").desc, col("is_probe"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = p.unionByName(v)
      .withColumn("next_view_ts", last("v_ts", ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select("event_id", "next_view_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(out(1L).contains(ts("2024-01-10 00:00:00"))) // the tied view
    assert(out(4L).isEmpty)
  }

  test("dropDuplicatesWithinWatermark emits each key once") {
    val counts = streaming.Streams.dedupedWithinWatermarkCounts(spark, sf0001)
    val plain = io.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("event_id").as("n"))
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }
}
