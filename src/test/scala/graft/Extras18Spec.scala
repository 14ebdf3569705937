package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-15 operators: medallion conservation,
  * LM score sign/coverage, cross-source firing, burst gating, manifest
  * sensitivity.
  */
class Extras18Spec extends SparkSpec {

  test("medallion: gold totals conserve silver (events are id-unique here)") {
    import spark.implicits._
    val got = SparkEntry.queries("pipeline_medallion")(spark, sf0001)
      .as[(java.sql.Timestamp, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = graft.io.Tables.events(spark, sf0001)
    assert(got.map(_._3).sum == ev.select("event_id").distinct().count(),
      "gold row counts sum to deduped bronze")
    got.foreach { case (_, _, n, _, users, _) =>
      assert(users <= n, "distinct users bounded by events")
    }
  }

  test("bigram lm: every score is negative (probabilities < 1); bigrams = len-1") {
    import spark.implicits._
    val got = SparkEntry.queries("text_bigram_lm")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val lens = graft.io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), " +")))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (id, nb, lm) =>
      assert(nb == math.max(lens(id) - 1, 0), s"doc $id bigram count")
      assert(lm < 0, s"doc $id: add-1 probs are < 1 so log-sum is negative")
    }
  }

  test("cross-source prefix report fires and counts are consistent") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_cross_source")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty, "boilerplate prefixes span sources in this corpus")
    got.foreach { case (fp, ns, nd, _) =>
      assert(ns >= 2 && nd >= ns, s"$fp counts")
    }
  }

  test("bursts: gated on >=12 history rows; flag recomputes from s24/n24") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_bursts")(spark, sf0001)
      .as[(String, java.sql.Timestamp, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (et, hr, c, s24, n24, burst) =>
      assert(burst == (n24 >= 12 && c * n24 > 3 * s24), s"$et/$hr recompute")
    }
    assert(got.forall(r => r._5 <= 24))
  }

  test("manifest: shard hash changes when any item would change") {
    import spark.implicits._
    val got = SparkEntry.queries("mm_manifest")(spark, sf0001)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == 8 && got.map(_._1).toSet == (0L to 7L).toSet)
    val docs = graft.io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(got.map(_._2).sum == docs.length)
    // recompute one shard's manifest in scala
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(b: Array[Byte]) =
      md.digest(b).map("%02x".format(_)).mkString
    val shard0 = docs.filter(_._1 % 8 == 0).sortBy(_._1)
      .map(r => md5hex(r._2.getBytes("UTF-8"))).mkString
    assert(got.find(_._1 == 0).get._4 == md5hex(shard0.getBytes("UTF-8")))
  }
}
