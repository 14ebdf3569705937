package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-7 operators beyond the DuckDB hash
  * gate: RFM score bounds and quintile balance, lift symmetry
  * identities, chi-square marginal consistency, KL non-negativity in
  * total, rolling-median membership, CUSUM telescoping, churn
  * conservation, log-return recompute.
  */
class Extras10Spec extends SparkSpec {

  test("rfm: scores span 1..5, quintiles are balanced, rfm string concatenates") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_rfm")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    Seq[((Long, Long, Long, Long, Long, Long, Long, String)) => Long](
      _._5, _._6, _._7).foreach { sc =>
      val byScore = got.groupBy(sc).view.mapValues(_.length)
      assert(byScore.keySet.subsetOf((1L to 5L).toSet))
      // ntile(5) buckets differ by at most one row
      assert(byScore.values.max - byScore.values.min <= 1, s"balance $byScore")
    }
    got.foreach { r =>
      assert(r._8 == s"${r._5}${r._6}${r._7}", s"rfm string for ${r._1}")
      assert(r._2 >= 0 && r._3 >= 1 && r._4 > 0)
    }
  }

  test("basket lift: pair counts bounded by marginals; lift consistent with counts") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_basket_lift")(spark, sf0001)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val b = graft.io.Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct()
      .as[(Long, String)].collect()
    val nUsers = b.map(_._1).distinct.length
    val marg = b.groupBy(_._2).view.mapValues(_.length).toMap
    assert(got.length == marg.keySet.toSeq.combinations(2).length)
    got.foreach { case (t1, t2, nAb, sup, conf, lift) =>
      assert(t1 < t2)
      assert(nAb <= math.min(marg(t1), marg(t2)), s"$t1/$t2 bound")
      assert(sup == math.round(nAb.toDouble * 1e6 / nUsers))
      assert(conf == math.round(nAb.toDouble * 1e6 / marg(t1)))
      assert(lift == math.round(nAb.toDouble * nUsers * 1e6 /
        (marg(t1).toDouble * marg(t2))))
    }
  }

  test("chi-square: observed cells sum to row/column marginals; terms non-negative") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_chi_square")(spark, sf0001)
      .as[(String, String, Long, Long, Long)].collect()
    val tot = got.map(_._3).sum
    val rowTot = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colTot = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    got.foreach { case (seg, st, o, e6, term6) =>
      assert(term6 >= 0, s"$seg/$st term")
      assert(e6 == math.round(rowTot(seg).toDouble * colTot(st) * 1e6 / tot),
        s"$seg/$st expected")
      val num = BigInt(o) * tot - BigInt(rowTot(seg)) * colTot(st)
      val expect = math.round((num * num).toDouble * 1e6 /
        (tot.toDouble * rowTot(seg) * colTot(st)))
      assert(term6 == expect, s"$seg/$st term recompute")
    }
  }

  test("kl divergence: total is non-negative (Gibbs) and p/q shares sum to ~1e6") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_kl_divergence")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // per-term KL can be negative; the sum over the full support cannot
    // (weekend support == full support in this data, else Gibbs is moot)
    assert(got.map(_._6).sum >= -got.length, "Gibbs inequality within rounding")
    assert(math.abs(got.map(_._4).sum - 1000000L) <= got.length)
    assert(math.abs(got.map(_._5).sum - 1000000L) <= got.length)
  }

  test("rolling median: value is a member of its trailing window") {
    import spark.implicits._
    val med = SparkEntry.queries("window_rolling_median")(spark, sf0001)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._3))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val frame = ordered.slice(math.max(0, i - 6), i + 1).map(_._4).sorted
        assert(med((u, r._3)) == frame((frame.length + 1) / 2 - 1),
          s"user $u event ${r._3}")
      }
    }
  }

  test("cusum telescopes: final cusum per user == sum(v6) - n*mean6") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_cusum")(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect()
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 1e6) AS BIGINT)").as("v6"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    val byUser = ev.groupBy(_._1)
    got.groupBy(_._1).foreach { case (u, rows) =>
      val evRows = byUser(u)
      val mean6 = math.round(evRows.map(_._4).sum.toDouble / evRows.length)
      val lastEvent = evRows.maxBy(r => (r._2.getTime, r._3))._3
      val finalCusum = rows.find(_._2 == lastEvent).get._3
      assert(finalCusum == evRows.map(_._4).sum - evRows.length * mean6,
        s"user $u telescoping")
    }
  }

  test("churn conserves: active == retained + churned; retention needs a next week") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_churn")(spark, sf0001)
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().sortBy(_._1.getTime)
    assert(got.nonEmpty)
    got.foreach { case (wk, a, r, c) => assert(a == r + c, s"week $wk") }
    // last week has no successor → everyone churns
    assert(got.last._3 == 0, "no retention into a week that doesn't exist")
    assert(got.map(_._2).sum > 0)
  }

  test("log returns match a scala recompute and deltas telescope per customer") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_log_returns")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val orders = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("p"))
      .as[(Long, Long, java.sql.Timestamp, Long)].collect()
    val byCust = orders.groupBy(_._1)
    got.groupBy(_._1).foreach { case (ck, rows) =>
      val series = byCust(ck).sortBy(r => (r._3.getTime, r._2)).map(_._4)
      assert(rows.length == series.length - 1, s"cust $ck row count")
      // total delta telescopes to last - first
      assert(rows.map(_._6).sum == series.last - series.head, s"cust $ck telescope")
    }
    got.foreach { case (ck, ok, p, prev, lr, delta) =>
      assert(delta == p - prev)
      assert(lr == math.round(math.log(p.toDouble / prev) * 1e6), s"$ck/$ok logret")
    }
  }
}
