package graft

import org.apache.spark.sql.functions._

/** Wave-51: windowed funnel and rolling WAU invariants. */
class Extras51Spec extends SparkSpec {

  test("windowed funnel: gated counts never exceed the unconstrained funnel") {
    val r = SparkEntry.queries("funnel_windowed")(spark, sf0001)
      .collect().head
    val nViewers = r.getAs[Long]("n_viewers")
    val nUsers = r.getAs[Long]("n_users_48h")
    assert(nViewers > 0)
    assert(nUsers <= nViewers)
    assert(r.getAs[Long]("n_purch_48h") >= nUsers) // ≥1 purchase per converter
    val cvr = r.getAs[Long]("cvr_e6")
    assert(cvr >= 0 && cvr <= 1000000L)
  }

  test("rolling WAU: every day ≥ its DAU and ≤ total users; days observed only") {
    val wau = SparkEntry.queries("analytics_rolling_wau")(spark, sf0001)
    val ev = graft.io.Tables.events(spark, sf0001)
    val dau = ev.select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct().groupBy("day").agg(countDistinct("user_id").as("dau"))
    val total = ev.select(countDistinct("user_id")).collect().head.getLong(0)
    val joined = wau.join(dau, "day").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val w = r.getAs[Long]("wau")
      assert(w >= r.getAs[Long]("dau") && w <= total)
    }
    // the report has exactly one row per observed activity day
    assert(wau.count() == dau.count())
  }

  test("join cost advisor: recommendation matches the executed join strategy") {
    val sf001 = "/root/testdata/sf0.01"
    val advisor = SparkEntry.queries("join_cost_advisor")(spark, sf001).collect()
    // the side recommendation derives from the global dim total, so all
    // bins agree; at sf0.01 (1500 customers ≤ the 1e6-row threshold)
    // it must say broadcast
    val hints = advisor.map(_.getAs[String]("side_hint")).distinct
    assert(hints.toSeq == Seq("broadcast"))
    def executed(hint: String): String = {
      val df = graft.io.Tables.orders(spark, sf001)
        .join(graft.io.Tables.customer(spark, sf001).hint(hint),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    // the advisor's recommendation, applied as the join hint, is what
    // the engine actually executes...
    assert(executed(hints.head).contains("BroadcastHashJoin"))
    // ...and the channel is causal: the opposite recommendation flips
    // the executed strategy (the shuffle_hash join_hinted forces)
    val sh = executed("shuffle_hash")
    assert(sh.contains("ShuffledHashJoin") && !sh.contains("BroadcastHashJoin"))
    // AQE's own unhinted final plan agrees with the advisor here — the
    // advisor predicts, from the histogram alone, the strategy the
    // runtime picks with full statistics
    val un = graft.io.Tables.orders(spark, sf001)
      .join(graft.io.Tables.customer(spark, sf001),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    un.write.format("noop").mode("overwrite").save()
    assert(un.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("pattern match: the running-state window equals regexp_count on " +
      "every tricky sequence (consumption, backtracking, breaks)") {
    import spark.implicits._
    // one user per constructed sequence; the window spelling must agree
    // with the regex count (the oracle's semantics) on the cases where
    // a naive automaton drifts: p-consumption (vpp), v-restart (vvcp),
    // broken run (vcep), leftmost non-overlap (vcpcp), multi-match
    // (vpvp), no-v prefix (pvc), pure c-run (vccp)
    val cases = Seq("vpp", "vvcp", "vcep", "vcvp", "vcpcp", "vpvp",
      "pvc", "vccp", "cpv", "vvvp", "vcc", "p")
    val rows = cases.zipWithIndex.flatMap { case (seq, u) =>
      seq.zipWithIndex.map { case (ch, k) =>
        (u.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${k}%02d"),
          (u * 100 + k).toLong, ch.toString)
      }
    }.toDF("user_id", "ts", "event_id", "event_type")
    // + one user with a NULL event_type between v and p: the oracle's
    // string_agg skips NULLs (seq = "vp"), so the null row must be
    // invisible to BOTH the automaton and n_events
    val nullUser = 900L
    val nullRows = Seq(("v", 0), (null, 1), ("p", 2)).map { case (t, k) =>
      (nullUser, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${k}%02d"),
        (nullUser * 100 + k), t)
    }.toDF("user_id", "ts", "event_id", "event_type")
    // + one user with an EMPTY-string event_type mid-journey: '' is
    // non-null, but substr('',1,1) = '' contributes ZERO characters to
    // the oracle's string_agg (seq = "vp"), so like NULL it must
    // neither reset last_nc nor count in n_events (the nullif pin)
    val emptyUser = 901L
    val emptyRows = Seq(("v", 0), ("", 1), ("p", 2)).map { case (t, k) =>
      (emptyUser, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${k}%02d"),
        (emptyUser * 100 + k), t)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ops.Extras51
      .journeyCounts(rows.unionByName(nullRows).unionByName(emptyRows))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case (seq, u) =>
      val expected = "vc*p".r.findAllIn(seq).size.toLong
      val gotN = got.get(u.toLong).map(_._2).getOrElse(0L)
      assert(gotN == expected, s"'$seq': got $gotN, regex says $expected")
      if (expected > 0)
        assert(got(u.toLong)._1 == seq.length.toLong, s"'$seq' n_events")
    }
    assert(got(nullUser) == ((2L, 1L)), got.get(nullUser))
    assert(got(emptyUser) == ((2L, 1L)), got.get(emptyUser))
  }

  test("pattern match: journey counts bounded by purchases; sequences real") {
    val got = SparkEntry.queries("seq_pattern_match")(spark, sf0001)
    val purchases = graft.io.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("np"))
    val joined = got.join(purchases, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val nj = r.getAs[Long]("n_journeys")
      assert(nj >= 1 && nj <= r.getAs[Long]("np")) // each journey ends in a distinct purchase
      assert(r.getAs[Long]("n_events") >= 2 * nj)  // v…p needs ≥2 events per journey
    }
  }

  test("equi-height histogram: bins partition rows, stats consistent") {
    val bins = SparkEntry.queries("agg_histogram_equiheight")(spark, sf0001)
      .orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = graft.io.Tables.lineitem(spark, sf0001).count()
    assert(bins.map(_.getAs[Long]("n_rows")).sum == total)
    bins.foreach { r =>
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
    }
    // bins are value-disjoint and ordered
    bins.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Long]("hi_cents") < w(1).getAs[Long]("lo_cents"))
    }
  }
}
