package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-3 operators beyond the DuckDB hash
  * gate: rolling-variance algebra against a reference fold, Pareto
  * boundary exactness, one-hot completeness, threshold-vs-ntile
  * bucketing semantics, URL canonical idempotence. */
class Extras6Spec extends SparkSpec {

  test("rolling variance numerator matches a per-row scala fold") {
    import spark.implicits._
    val rows = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
      .sortBy(r => (r._1, r._2.getTime, r._3))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.zipWithIndex.map { case ((_, _, eid, _), i) =>
        val w = g.slice(math.max(0, i - 23), i + 1).map(_._4)
        val n = w.size.toLong
        eid -> (n * w.map(c => c * c).sum - w.sum * w.sum)
      }
    }
    val got = SparkEntry.queries("window_rolling_var")(spark, sf0001)
      .select("event_id", "var_num_cents2").as[(Long, Long)].collect().toMap
    assert(got.size == rows.length)
    expected.foreach { case (eid, v) =>
      assert(got(eid) == v, s"event_id=$eid")
    }
    // variance numerator n·Σx²−(Σx)² is non-negative by Cauchy-Schwarz
    assert(got.values.forall(_ >= 0))
  }

  test("pareto boundary: top-(n-1) customers stay under 80%, top-n reach it") {
    import spark.implicits._
    val Array((nTop, _, total)) = SparkEntry.queries("analytics_pareto")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val cents = graft.io.Tables.orders(spark, sf0001).groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .select("c").as[Long].collect().sorted(Ordering[Long].reverse)
    assert(cents.sum == total)
    assert(5 * cents.take(nTop.toInt).sum >= 4 * total)
    assert(5 * cents.take(nTop.toInt - 1).sum < 4 * total)
  }

  test("one-hot rows have exactly one hot column; counts match groupBy") {
    import spark.implicits._
    val df = SparkEntry.queries("feature_onehot")(spark, sf0001)
    val hotCols = df.columns.filter(_.startsWith("seg_"))
    val rowSums = df.select(hotCols.map(col).reduce(_ + _).as("s")).as[Long].collect()
    assert(rowSums.forall(_ == 1L))
    val fromOneHot = hotCols.map(c => c -> df.agg(sum(col(c))).as[Long].head()).toMap
    val fromGroup = graft.io.Tables.customer(spark, sf0001)
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect()
      .map { case (seg, n) => s"seg_${seg.toLowerCase}" -> n }.toMap
    assert(fromOneHot == fromGroup)
  }

  test("threshold buckets are ordered, complete, and respect the cut points") {
    import spark.implicits._
    val b = SparkEntry.queries("feature_quantile_bucket")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(b.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(b.map(_._2).sum ==
      graft.io.Tables.orders(spark, sf0001).count())
    // bucket value ranges must not overlap: hi(k) < lo(k+1)
    b.sliding(2).foreach { case Array(x, y) =>
      assert(x._4 < y._3, s"bucket ${x._1} hi=${x._4} vs ${y._1} lo=${y._3}")
    }
  }

  test("ohlc: open/close come from first/last event of the day, high >= low") {
    import spark.implicits._
    val got = SparkEntry.queries("ts_ohlc")(spark, sf0001)
      .as[(Long, java.sql.Timestamp, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, day, o, c, h, l, n) =>
      assert(h >= l && h >= o && h >= c && l <= o && l <= c && n >= 1,
        s"user=$u day=$day")
    }
    // cross-check one (user, day) group row-by-row
    val (u0, d0) = (got.head._1, got.head._2)
    val ev = graft.io.Tables.events(spark, sf0001)
      .filter(col("user_id") === u0 &&
        date_trunc("day", col("ts")) === lit(d0))
      .select(col("ts"), col("event_id"), round(col("value") * 1e6).cast("long").as("v6"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .sortBy(r => (r._1.getTime, r._2))
    assert(got.head._3 == ev.head._3 && got.head._4 == ev.last._3)
    assert(got.head._5 == ev.map(_._3).max && got.head._6 == ev.map(_._3).min)
    assert(got.head._7 == ev.length)
  }

  test("haversine distances are plausible and match a scala reference") {
    import spark.implicits._
    val got = SparkEntry.queries("geo_haversine")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    // half Earth circumference bound
    assert(got.values.forall(m => m >= 0 && m <= 20015087L))
    def ref(ck: Long): Long = {
      val lat1 = ck % 180 - 89.5; val lon1 = ck * 7 % 360 - 179.5
      val dphi = math.toRadians(48.8566 - lat1)
      val dlmb = math.toRadians(2.3522 - lon1)
      val h = math.sin(dphi / 2) * math.sin(dphi / 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(48.8566)) *
          math.sin(dlmb / 2) * math.sin(dlmb / 2)
      math.round(2 * 6371000.0 * math.asin(math.sqrt(h)))
    }
    got.foreach { case (ck, m) =>
      assert(math.abs(m - ref(ck)) <= 1L, s"custkey=$ck got=$m ref=${ref(ck)}")
    }
  }

  test("ctas is idempotent: second run replaces, result unchanged") {
    val a = SparkEntry.queries("sql_ctas")(spark, sf0001).collect().map(_.toString)
    val b = SparkEntry.queries("sql_ctas")(spark, sf0001).collect().map(_.toString)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
  }

  test("freshness: freshest feed has zero lag; totals cover all events") {
    import spark.implicits._
    val rows = SparkEntry.queries("dq_freshness")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._3).min == 0L)
    assert(rows.map(_._4).sum == graft.io.Tables.events(spark, sf0001).count())
    rows.foreach { case (t, _, lag, total, lastDay) =>
      assert(lag >= 0 && lastDay <= total, t)
    }
  }

  test("skew/kurtosis match an exact BigInt power-sum reference") {
    import spark.implicits._
    val got = SparkEntry.queries("agg_skew_kurtosis")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    val vals = graft.io.Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 10).cast("long").as("x"))
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (et, n, skew6, kurt6) =>
      val xs = vals(et).map(v => BigInt(v._2))
      assert(n == xs.length)
      val nd = xs.length.toDouble
      val (s1, s2) = (xs.sum.toDouble / nd, xs.map(x => x * x).sum.toDouble / nd)
      val s3 = xs.map(x => x * x * x).sum.toDouble / nd
      val s4 = xs.map(x => x * x * x * x).sum.toDouble / nd
      val m2 = s2 - s1 * s1
      val skew = (s3 - 3 * s1 * s2 + 2 * s1 * s1 * s1) / math.pow(m2, 1.5)
      val kurt = (s4 - 4 * s1 * s3 + 6 * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1) / (m2 * m2) - 3
      assert(math.abs(skew6 - math.round(skew * 1e6)) <= 1, s"$et skew")
      assert(math.abs(kurt6 - math.round(kurt * 1e6)) <= 1, s"$et kurt")
    }
  }

  test("repetition score matches a scala fold on sampled docs") {
    import spark.implicits._
    val got = SparkEntry.queries("text_repetition_score")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val docs = graft.io.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length == docs.size)
    got.foreach { case (id, n, nd, dup6, top6, simp6, maxRun) =>
      val ws = docs(id).split(" ")
      val counts = ws.groupBy(identity).map(_._2.length.toLong)
      assert(n == ws.length && nd == counts.size)
      assert(dup6 == (n - nd) * 1000000L / n)
      assert(top6 == counts.max * 1000000L / n)
      assert(simp6 == counts.map(c => c * c).sum * 1000000L / (n * n))
      val runs = ws.foldLeft(List.empty[(String, Long)]) {
        case ((w, c) :: t, x) if w == x => (w, c + 1) :: t
        case (acc, x) => (x, 1L) :: acc
      }
      assert(maxRun == runs.map(_._2).max, s"doc=$id")
    }
    // the corpus plants repeated-token runs — the signal must fire
    assert(got.exists(_._7 >= 3))
  }

  test("corpus mix sample fills each pool to its quota") {
    import spark.implicits._
    val sample = SparkEntry.queries("corpus_mix_sample")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val pools = graft.io.Tables.documents(spark, sf0001)
      .select((substring(col("source"), 4, 10).cast("int") % 3).cast("long").as("p"))
      .as[Long].collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = pools.values.sum
    val quota = Map(0L -> 50L * total / 100, 1L -> 30L * total / 100, 2L -> 20L * total / 100)
    val byPool = sample.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    quota.foreach { case (p, q) =>
      assert(byPool.getOrElse(p, 0L) == math.min(q, pools(p)), s"pool=$p")
    }
    // sampling is deterministic: rerun yields the identical id set
    val again = SparkEntry.queries("corpus_mix_sample")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(sample.map(_._1).sorted.toSeq == again.map(_._1).sorted.toSeq)
  }

  test("url canonicalization is idempotent and drops only the query string") {
    import spark.implicits._
    val c = SparkEntry.queries("dedup_url")(spark, sf0001)
    val canon = c.select("canonical").as[String].collect()
    canon.foreach { u =>
      assert(u == u.toLowerCase && !u.contains("?") && !u.endsWith("/"), u)
    }
    // every document lands in exactly one group
    import org.apache.spark.sql.Row
    val Row(total: Long) = c.agg(sum("n_dups")).head()
    assert(total == graft.io.Tables.documents(spark, sf0001).count())
  }
}
