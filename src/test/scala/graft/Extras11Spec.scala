package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-8 operators beyond the DuckDB hash
  * gate: t/z statistic recomputes from raw data, correlation bounds,
  * seasonal-index weighted mean, autocorrelation range, LOO-encoding
  * exclusion property, late-dim fact conservation, degree handshake.
  */
class Extras11Spec extends SparkSpec {

  test("welch t: recomputes from raw balances; sign matches mean order") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_ttest_welch")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n1, n2, mdiff, t) = got.head
    val raw = graft.io.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), expr("CAST(round(c_acctbal*100) AS BIGINT)"))
      .as[(String, Long)].collect()
    val a = raw.filter(_._1 == "BUILDING").map(_._2)
    val b = raw.filter(_._1 == "MACHINERY").map(_._2)
    assert(n1 == a.length && n2 == b.length)
    def mean(xs: Array[Long]) = xs.sum.toDouble / xs.length
    def varS(xs: Array[Long]) = {
      val ssq = xs.map(x => BigInt(x) * x).sum.toDouble
      (ssq - xs.sum.toDouble * xs.sum / xs.length) / (xs.length - 1)
    }
    assert(mdiff == math.round((mean(a) - mean(b)) * 1e2))
    val tExp = (mean(a) - mean(b)) /
      math.sqrt(varS(a) / a.length + varS(b) / b.length)
    assert(t == math.round(tExp * 1e6), s"t recompute: $t vs $tExp")
  }

  test("pearson: r in [-1e6, 1e6]; recomputes from raw pairs per flag") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_pearson")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = graft.io.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(round(l_extendedprice*100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (rf, n, r6) =>
      assert(math.abs(r6) <= 1000000L, s"$rf bound")
      val xs = raw.filter(_._1 == rf)
      assert(n == xs.length)
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(p => p._2 * p._3).sum
      val sxx = xs.map(p => p._2 * p._2).sum
      val syy = xs.map(p => BigInt(p._3) * p._3).sum.toDouble
      val rExp = (n.toDouble * sxy - sx.toDouble * sy) /
        math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
          (n.toDouble * syy - sy.toDouble * sy))
      assert(r6 == math.round(rExp * 1e6), s"$rf recompute")
    }
  }

  test("abtest: counts partition, proportions consistent, z recomputes") {
    import spark.implicits._
    val got = SparkEntry.queries("analytics_abtest")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n1, x1, n2, x2, p1, p2, z) = got.head
    assert(x1 <= n1 && x2 <= n2 && n1 > 0 && n2 > 0)
    assert(p1 == math.round(x1.toDouble * 1e6 / n1))
    assert(p2 == math.round(x2.toDouble * 1e6 / n2))
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val zExp = (x1.toDouble / n1 - x2.toDouble / n2) /
      math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(z == math.round(zExp * 1e6), "z recompute")
  }

  test("seasonal index: weighted mean of indices is ~1e6; totals conserve") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_seasonal_index")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 >= 0 && r._1 <= 23))
    val nt = got.map(_._2).sum
    // Σ n_h · idx_h / n_t == 1e6 up to per-term rounding
    val wavg = got.map(r => r._2.toDouble * r._4).sum / nt
    assert(math.abs(wavg - 1e6) < 50, s"weighted index mean $wavg")
  }

  test("autocorr: r1 in [-1e6,1e6]; pair counts = events-1 per reported user") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_autocorr")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val evCnt = graft.io.Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    got.foreach { case (u, n, r6) =>
      assert(math.abs(r6) <= 1000000L, s"user $u bound")
      assert(n == evCnt(u) - 1, s"user $u pair count")
      assert(n >= 3)
    }
  }

  test("target encode: LOO excludes own row — segment mean shifts against own value") {
    import spark.implicits._
    val got = SparkEntry.queries("feature_target_encode")(spark, sf0001)
      .as[(Long, String, Long, Long)].collect()
    val bySeg = got.groupBy(_._2)
    bySeg.foreach { case (seg, rows) =>
      val s = rows.map(_._3).sum; val n = rows.length
      rows.foreach { case (ok, _, y, loo) =>
        assert(loo == math.round((s - y).toDouble / (n - 1)), s"$seg/$ok")
      }
      // LOO of the max element is ≤ plain mean; of the min element ≥
      val mx = rows.maxBy(_._3); val mn = rows.minBy(_._3)
      val mean = s.toDouble / n
      assert(mx._4 <= math.round(mean) + 1 && mn._4 >= math.round(mean) - 1)
    }
  }

  test("late dim: fact conservation; UNKNOWN exactly for non-positive-balance owners") {
    import spark.implicits._
    val got = SparkEntry.queries("join_late_dim")(spark, sf0001)
      .as[(Long, Long, String, Boolean)].collect()
    val nOrders = graft.io.Tables.orders(spark, sf0001).count()
    assert(got.length == nOrders, "left join conserves facts")
    val posCust = graft.io.Tables.customer(spark, sf0001)
      .filter(col("c_acctbal") > 0).select("c_custkey")
      .as[Long].collect().toSet
    got.foreach { case (ok, ck, seg, late) =>
      assert(late == !posCust.contains(ck), s"order $ok flag")
      assert((seg == "UNKNOWN") == late, s"order $ok segment")
    }
    assert(got.exists(_._4), "fallback path actually fires on this data")
  }

  test("graph degree: handshake lemma — degrees sum to 2·|edges|") {
    import spark.implicits._
    val deg = SparkEntry.queries("graph_degree")(spark, sf0001)
      .as[(Long, Long)].collect()
    val edges = graft.text.Dedup
      .nearDupPairs(graft.io.Tables.documents(spark, sf0001),
        "doc_id", "text", 0.7).count()
    assert(deg.map(_._2).sum == 2 * edges)
    assert(deg.forall(_._2 >= 1))
  }
}
