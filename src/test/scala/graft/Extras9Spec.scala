package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-6 operators beyond the DuckDB hash
  * gate: Benford shares sum to one, Gini bounds, drawdown
  * non-negativity vs a scala recompute, as-of tolerance nulling,
  * weighted-median threshold semantics, forecast-error recompute.
  */
class Extras9Spec extends SparkSpec {

  test("benford shares sum to ~1e6 and digits are 1..9") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_benford")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet.subsetOf((1L to 9L).toSet))
    val totalShare = got.map(_._3).sum
    assert(math.abs(totalShare - 1000000L) <= got.length, s"share sum $totalShare")
    val benfordSum = (1 to 9).map(dd =>
      math.round(math.log(1.0 + 1.0 / dd) / math.log(10.0) * 1e6)).sum
    assert(math.abs(benfordSum - 1000000L) <= 9)
    got.foreach { case (dd, _, s, b, dev) => assert(dev == s - b, s"digit $dd") }
  }

  test("gini is in [0,1) and matches a scala recompute per segment") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_gini")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    val spend = graft.io.Tables.orders(spark, sf0001)
      .join(graft.io.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (seg, n, g6) =>
      assert(g6 >= 0 && g6 < 1000000, s"$seg bounds")
      val xs = spend(seg).sortBy(r => (r._3, r._2)).map(_._3)
      assert(n == xs.length)
      val s2 = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * BigInt(x) }.sum
      val s1 = xs.map(BigInt(_)).sum
      val expected = math.round(
        (2.0 * s2.toDouble / (n * s1.toDouble) - (n + 1.0) / n) * 1e6)
      assert(g6 == expected, s"$seg gini")
    }
  }

  test("max drawdown is non-negative and matches a scala fold") {
    import spark.implicits._
    val got = SparkEntry.queries("window_drawdown")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 1e6) AS BIGINT)").as("v6"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (u, rows) =>
      var eq = 0L; var peak = Long.MinValue; var dd = Long.MinValue
      rows.sortBy(r => (r._2.getTime, r._3)).foreach { r =>
        eq += r._4; peak = math.max(peak, eq); dd = math.max(dd, peak - eq)
      }
      assert(got(u) == dd, s"user $u")
      assert(dd >= 0)
    }
  }

  test("as-of tolerance: every match is within 1h; out-of-window matches null out") {
    import spark.implicits._
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf0001)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    val plain = SparkEntry.queries("join_asof")(spark, sf0001)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(tol.nonEmpty)
    var nulledByTolerance = 0
    tol.foreach { case (eid, _, ts, lv) =>
      lv.foreach { v =>
        assert(v.getTime <= ts.getTime && ts.getTime - v.getTime <= 3600 * 1000L,
          s"event $eid outside tolerance")
      }
      (plain(eid), lv) match {
        case (Some(pv), None) =>
          assert(ts.getTime - pv.getTime > 3600 * 1000L, s"event $eid wrongly nulled")
          nulledByTolerance += 1
        case (pv, tv) => assert(pv == tv, s"event $eid")
      }
    }
    assert(nulledByTolerance > 0, "tolerance should bite somewhere in the data")
  }

  test("weighted median: half the weight sits at or below it, and it's attained") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_weighted_percentile")(spark, sf0001)
      .as[(String, Long)].collect()
    val rows = graft.io.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("q"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("w"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (flag, m) =>
      val rs = rows(flag)
      val tw = rs.map(_._3).sum
      val below = rs.filter(_._2 <= m).map(_._3).sum
      val strictlyBelow = rs.filter(_._2 < m).map(_._3).sum
      assert(2 * below >= tw, s"$flag: median covers half the weight")
      assert(2 * strictlyBelow < tw, s"$flag: minimality")
      assert(rs.exists(_._2 == m), s"$flag: attained value")
    }
  }

  test("seasonal-naive MAE matches a scala recompute over hourly buckets") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_forecast_error")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    val hourly = graft.io.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(expr("CAST(round(value * 1e6) AS BIGINT)")).as("s6"))
      .as[(String, java.sql.Timestamp, Long)].collect().groupBy(_._1)
    got.foreach { case (et, n, mae) =>
      val series = hourly(et).sortBy(_._2.getTime).map(_._3)
      val errs = series.drop(24).zip(series.dropRight(24)).map(p => (p._1 - p._2).abs)
      assert(n == errs.length, s"$et n_eval")
      assert(mae == math.round(errs.sum.toDouble / errs.length), s"$et mae")
    }
  }
}
