package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-14 operators: KS distance bounds and
  * recompute, Spearman rank-correlation bounds and agreement with a
  * scala recompute, crossover flag consistency.
  */
class Extras17Spec extends SparkSpec {

  test("ks: D in [0,1e6]; matches a scala recompute over the pooled order") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_ks_test")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n1, n2, dnum, d6) = got.head
    assert(d6 >= 0 && d6 <= 1000000L)
    val raw = graft.io.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), expr("CAST(round(c_acctbal*100) AS BIGINT)"))
      .as[(String, Long)].collect()
    assert(n1 == raw.count(_._1 == "BUILDING") && n2 == raw.count(_._1 == "MACHINERY"))
    var c1 = 0L; var c2 = 0L; var mx = 0L
    raw.sortBy(r => (r._2, r._1)).foreach { case (seg, _) =>
      if (seg == "BUILDING") c1 += 1 else c2 += 1
      mx = math.max(mx, math.abs(c1 * n2 - c2 * n1))
    }
    assert(dnum == mx, "integer numerator recompute")
    assert(d6 == math.round(mx.toDouble / (n1 * n2) * 1e6))
  }

  test("spearman: |rho| <= 1e6; sign matches pearson of doubled ranks recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_spearman")(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = graft.io.Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(round(l_extendedprice*100) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (rf, n, rho) =>
      assert(math.abs(rho) <= 1000000L, s"$rf bound")
      val g = raw.filter(_._1 == rf)
      assert(n == g.length)
      def doubledRanks(vals: Array[Long]): Map[Long, Long] = {
        val sorted = vals.sorted
        val firstIdx = sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, xs) => v -> (xs.map(_._2).min + 1) }
        val ties = vals.groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
        firstIdx.map { case (v, rk) => v -> (2L * rk + ties(v) - 1) }
      }
      val rxm = doubledRanks(g.map(_._2)); val rym = doubledRanks(g.map(_._3))
      val rx = g.map(r => rxm(r._2)); val ry = g.map(r => rym(r._3))
      val sx = rx.sum; val sy = ry.sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum.toDouble
      val sxx = rx.map(a => BigInt(a) * a).sum.toDouble
      val syy = ry.map(a => BigInt(a) * a).sum.toDouble
      val expect = (n.toDouble * sxy - sx.toDouble * sy) /
        math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
          (n.toDouble * syy - sy.toDouble * sy))
      assert(rho == math.round(expect * 1e6), s"$rf recompute")
    }
  }

  test("sma crossover: first order per customer never crosses; flags need a state flip") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_sma_crossover")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.exists(_._4 == 1L), "crossover path fires")
    val orders = graft.io.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
    got.groupBy(_._1).foreach { case (ck, rows) =>
      val firstOk = orders.filter(_._1 == ck)
        .minBy(r => (r._3.getTime, r._2))._2
      val first = rows.find(_._2 == firstOk).get
      assert(first._4 == 0, s"cust $ck first order cannot cross")
      // crossover implies the above-state differs from the previous row
      val ordered = orders.filter(_._1 == ck).sortBy(r => (r._3.getTime, r._2))
        .map(r => rows.find(x => x._2 == r._2).get)
      ordered.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert((b._4 == 1) == (a._3 != b._3), s"cust $ck flag consistency")
      }
    }
  }
}
