package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-43 operators. */
class Extras45Spec extends SparkSpec {

  test("centroid shift: halves partition each label; matches a naive replay") {
    import spark.implicits._
    val got = SparkEntry.queries("emb_centroid_shift")(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect()
    val emb = graft.io.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    assert(got.map(r => r._2 + r._3).sum == emb.length, "halves partition corpus")
    got.foreach { case (lbl, na, nb, shiftE6) =>
      val rows = emb.filter(_._2 == lbl)
      val (ea, eb) = rows.partition(_._1 % 2 == 0)
      assert(na == ea.length && nb == eb.length, s"label $lbl split")
      val dim = rows.head._3.length
      val shift = math.sqrt((0 until dim).map { p =>
        val ca = ea.map(r => math.round(r._3(p).toDouble * 1e4)).sum.toDouble / na
        val cb = eb.map(r => math.round(r._3(p).toDouble * 1e4)).sum.toDouble / nb
        (ca - cb) * (ca - cb)
      }.sum) / 1e4
      assert(math.abs(shiftE6 - shift * 1e6) <= 2, s"label $lbl: $shiftE6 vs $shift")
    }
  }

  test("runs test: run count bounded; z matches a naive replay per user") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_runs_test")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
    got.foreach { case (u, n1, n2, runs, zE6) =>
      val cs = ev.filter(_._1 == u)
        .sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._4)
      val signs = cs.sliding(2).filter(_.length == 2)
        .map(p => java.lang.Long.signum(p(1) - p(0))).filter(_ != 0).toSeq
      assert(n1 == signs.count(_ == 1) && n2 == signs.count(_ == -1), s"user $u")
      val r = 1 + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      assert(runs == r, s"user $u runs")
      assert(runs >= 1 && runs <= n1 + n2, s"user $u run bounds")
      val nn = (n1 + n2).toDouble
      val er = 2.0 * n1 * n2 / nn + 1
      val vr = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1))
      assert(math.abs(zE6 - (r - er) / math.sqrt(vr) * 1e6) <= 2, s"user $u z")
    }
  }
}
