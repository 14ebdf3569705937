package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Round-4 operators: bitmap distinct counting, binned interval join,
  * URL round-trips, batch sessionization boundaries, incremental
  * high-watermark merge.
  */
class Extras4Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("feature_scale's z moments survive segments past the 64-bit cliff") {
    // 35k rows of ~1e6-cent values in ONE segment: the cent-sum s ≈
    // 3.5e10, so s² ≈ 1.2e21 and n·s2 ≈ 3.7e22 — both far past
    // Long.MaxValue (the 10× spot-bench hit exactly this, as an ANSI
    // ARITHMETIC_OVERFLOW). The registered query must run the real
    // code path on such a segment and produce finite micro-grid
    // z-scores that match a BigDecimal reference on a spot row.
    val dir = java.nio.file.Files.createTempDirectory("graft_fs_ovf").toString
    val n = 35000
    spark.range(n).select(
        (col("id") + 1).as("c_custkey"),
        concat(lit("Customer#"), col("id")).as("c_name"),
        (col("id") % 25).as("c_nationkey"),
        // 2-dp values spread over ~[0, 20000.00] — cents up to 2e6
        ((col("id") % 2000000L).cast("double") / 100.0).as("c_acctbal"),
        lit("BUILDING").as("c_mktsegment"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val q = graft.ops.Extras4.queries.find(_.name == "feature_scale").get
    val rows = q.fn(spark, dir).collect()
    assert(rows.length == n)
    val zs = rows.map(_.getLong(2))
    assert(zs.forall(z => math.abs(z) < 4000000L)) // |z| < 4 on the µ-grid
    // spot-check the first row against an independent BigInt reference
    val vs = (0 until n).map(i => BigInt(i % 2000000))
    val s1 = vs.sum; val s2 = vs.map(v => v * v).sum
    val v0 = vs.head
    val den = (BigInt(n) * s2 - s1 * s1).toDouble
    val expected = java.math.BigDecimal.valueOf(
      (v0 * n - s1).toDouble / math.sqrt(den) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val first = rows.find(_.getLong(0) == 1L).get
    assert(first.getLong(2) == expected)
  }

  test("bitmap distinct-count equals exact count distinct across buckets") {
    // keys straddle the 32768-bit bitmap bucket boundary on purpose
    val df = Seq(1L, 2L, 32768L, 32769L, 32769L, 70000L, 1L)
      .toDF("k").withColumn("g", lit("a"))
    val n = df
      .groupBy(col("g"), expr("bitmap_bucket_number(k)").as("b"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(k))").as("bm"))
      .groupBy("g").agg(sum(expr("bitmap_count(bm)")).as("n"))
      .head().getLong(1)
    assert(n == 5L)
  }

  test("binned interval join matches the naive range join exactly") {
    val points = Seq((1L, -130.0), (2L, 0.0), (3L, 63.9), (4L, 64.0),
      (5L, 200.0)).toDF("pid", "x")
    val intervals = Seq((10L, -100.0), (11L, 50.0), (12L, 190.0))
      .toDF("iid", "center")
    val naive = points.join(intervals,
        col("x").between(col("center") - 50, col("center") + 50))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binW = 64.0
    val iv = intervals
      .withColumn("lo", col("center") - 50).withColumn("hi", col("center") + 50)
      .withColumn("bin", explode(sequence(floor(col("lo") / binW), floor(col("hi") / binW))))
    val p = points.withColumn("bin", floor(col("x") / binW))
    val binned = p.join(iv,
        p("bin") === iv("bin") && p("x").between(iv("lo"), iv("hi")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.contains((1L, 10L)) && naive.contains((5L, 12L)))
  }

  test("url_encode/parse_url/url_decode round-trip including reserved chars") {
    val df = Seq("A&B #1").toDF("name")
      .withColumn("url", concat(lit("https://h.example.com/p?q="),
        url_encode(col("name"))))
    val r = df.select(
      parse_url(col("url"), lit("HOST")).as("h"),
      parse_url(col("url"), lit("QUERY"), lit("q")).as("q"),
      url_decode(url_encode(col("name"))).as("rt")).head()
    assert(r.getString(0) == "h.example.com")
    assert(r.getString(2) == "A&B #1")
  }

  test("session_window merges at exactly the gap and splits just past it") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:30:00")), // exactly gap → merges (inclusive)
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:30:00.001")) // just past gap → new session
    ).toDF("user_id", "ts")
    val sess = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .orderBy("user_id").collect().map(_.getLong(1)).toSeq
    assert(sess == Seq(1L, 2L))
  }

  test("incremental merge equals the full recompute") {
    val ev = Seq(
      (1L, ts("2024-01-10 00:00:00"), 2.5),
      (1L, ts("2024-01-25 00:00:00"), 1.5),
      (2L, ts("2024-01-05 00:00:00"), 4.0),
      (3L, ts("2024-01-28 00:00:00"), 3.0) // new key after the watermark
    ).toDF("user_id", "ts", "value")
    val wm = lit("2024-01-20 00:00:00").cast("timestamp")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("v"))
    val base = agg(ev.filter(col("ts") < wm))
    val inc = agg(ev.filter(col("ts") >= wm))
      .withColumnRenamed("user_id", "iu")
      .withColumnRenamed("n", "in").withColumnRenamed("v", "iv")
    val merged = base.join(inc, col("user_id") === col("iu"), "full_outer")
      .select(coalesce(col("user_id"), col("iu")).as("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("in"), lit(0L))).as("n"),
        (coalesce(col("v"), lit(0L)) + coalesce(col("iv"), lit(0L))).as("v"))
    val full = agg(ev)
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("exact-integer kmeans separates obvious clusters, invariant to partitioning") {
    import graft.sim.Clustering
    // two tight blobs far apart; k=2 seeds land one in each after update
    val rows = (0 until 8).map { i =>
      val base = if (i % 2 == 0) 0.1f else -0.4f
      (i.toLong, Array.fill(4)(base + i * 1e-6f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out1 = Clustering.kmeans(df, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // evens (near 0.1) and odds (near -0.4) form the two clusters
    assert(out1.filterKeys(_ % 2 == 0).values.toSet.size == 1)
    assert(out1.filterKeys(_ % 2 == 1).values.toSet.size == 1)
    assert(out1(0L) != out1(1L))
    // bit-identical under a different partitioning (exact integer math)
    val out7 = Clustering.kmeans(df.repartition(7), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val outA = Clustering.kmeans(df, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out7.toSeq == outA.toSeq)
  }
}
