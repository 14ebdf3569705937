package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScaleRank

/** ScaleRank's contract is bit-equality with the single-partition
  * spellings it replaces. Exercise it against Window.orderBy ground
  * truth over seeded random data dense with ties — the case where a
  * wrong range assignment or offset would surface instantly.
  */
class ScaleRankSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // values drawn from a tiny domain → heavy ties at every cutpoint
    (1 to n).map(i => (i.toLong, rnd.nextInt(17).toLong - 8))
      .toDF("k", "v")
  }

  test("withGlobalRank == global-sort row_number/running sum, asc and desc") {
    for (seed <- Seq(1L, 2L, 3L); desc <- Seq(false, true)) {
      val df = randomDf(seed, 500)
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc, col("k"))
      val expected = df
        .withColumn("rk_exp", row_number().over(w).cast("long"))
        .withColumn("run_exp", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val got = ScaleRank.withGlobalRank(df, "v", "k", descending = desc,
        nRanges = 8, runOn = Some("v"))
      val joined = expected.join(got.withColumnRenamed("v", "v2"), "k")
      assert(joined.filter(col("rk") =!= col("rk_exp") ||
        col("run") =!= col("run_exp")).count() == 0,
        s"seed=$seed desc=$desc")
    }
  }

  test("NULL metrics rank like the window spelling: FIRST asc, LAST desc; NULL-prefix running sums match") {
    // nulls scattered through a tied domain, including the very first
    // rows of several range cells — the shapes where the old behavior
    // ranked DESC nulls FIRST and nulled-out running sums whose prior
    // cells carried real totals
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map { i =>
      val v: java.lang.Long =
        if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(11).toLong - 5)
      (i.toLong, v)
    }.toDF("k", "v")
    for (desc <- Seq(false, true)) {
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc, col("k"))
      val expected = df
        .withColumn("rk_exp", row_number().over(w).cast("long"))
        .withColumn("run_exp", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val got = ScaleRank.withGlobalRank(df, "v", "k", descending = desc,
        nRanges = 8, runOn = Some("v"))
      val joined = expected.join(got.withColumnRenamed("v", "v2"), "k")
      assert(joined.filter(col("rk") =!= col("rk_exp") ||
        !(col("run") <=> col("run_exp"))).count() == 0, s"desc=$desc")
    }
  }

  test("NULL partition/group keys survive partitionedRunningSum and grouped quantiles") {
    val df = Seq[(java.lang.Long, Long, Long)](
      (null, 1L, 10L), (null, 2L, 20L), (1L, 3L, 5L), (1L, 4L, 7L),
      (null, 5L, 30L), (2L, 6L, 9L))
      .toDF("g", "ord", "x")
    val got = ScaleRank.partitionedRunningSum(df, "g", Seq("ord"), "x",
      floor(col("ord") / 2), "cum")
    // every input row survives — the old === join dropped NULL keys
    assert(got.count() == 6)
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("cum_exp", sum(col("x")).over(w))
    assert(got.join(exp.select(col("ord"), col("cum_exp")), "ord")
      .filter(col("cum") =!= col("cum_exp")).count() == 0)
    // grouped quantiles emit a row for the NULL group like GROUP BY does
    val q = ScaleRank.groupedQuantilesDisc(df, "g", "x",
      Seq((1, 2)), Seq("med"), v => floor(v / 16))
    assert(q.count() == 3)
    assert(q.filter(col("g").isNull).select("med").head().getLong(0) == 20L)
  }

  test("withGlobalRanksMulti fused == three independent global sorts") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 700).map { i =>
      (i.toLong, rnd.nextInt(13).toLong, rnd.nextInt(29).toLong,
        rnd.nextInt(7).toLong)
    }.toDF("k", "a", "b", "c")
    def exp(m: String, desc: Boolean) = row_number().over(
      Window.orderBy(if (desc) col(m).desc else col(m).asc, col("k")))
      .cast("long")
    val expected = df
      .withColumn("ra_exp", exp("a", desc = false))
      .withColumn("rb_exp", exp("b", desc = true))
      .withColumn("rc_exp", exp("c", desc = false))
    val got = ScaleRank.withGlobalRanksMulti(df, Seq(
        ScaleRank.RankOn("a", "ra", nName = Some("n")),
        ScaleRank.RankOn("b", "rb", descending = true),
        ScaleRank.RankOn("c", "rc")), "k", nRanges = 8)
    val joined = expected.select("k", "ra_exp", "rb_exp", "rc_exp")
      .join(got, "k")
    assert(joined.filter(col("ra") =!= col("ra_exp") ||
      col("rb") =!= col("rb_exp") || col("rc") =!= col("rc_exp") ||
      col("n") =!= lit(700L)).count() == 0)
  }

  test("exactQuantilesDisc == percentile_disc, tie-heavy and distinct data") {
    for (seed <- Seq(5L, 6L); n <- Seq(37, 500)) {
      val df = randomDf(seed, n).select(col("v")) // values from a 17-wide domain: heavy ties
      val fracs = Seq(1 -> 10, 1 -> 4, 1 -> 2, 3 -> 4, 9 -> 10, 1 -> 1)
      val names = fracs.map { case (a, b) => s"q_${a}_$b" }
      val got = ScaleRank.exactQuantilesDisc(df, "v", fracs, names,
        nRanges = 8).head()
      val exp = df.agg(
        expr("CAST(percentile_disc(0.1) WITHIN GROUP (ORDER BY v) AS LONG)"),
        expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS LONG)"),
        expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS LONG)"),
        expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS LONG)"),
        expr("CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS LONG)"),
        expr("CAST(percentile_disc(1.0) WITHIN GROUP (ORDER BY v) AS LONG)")).head()
      for (i <- fracs.indices)
        assert(got.getLong(i) == exp.getLong(i), s"seed=$seed n=$n i=$i")
    }
  }

  test("groupedQuantilesDisc == per-group percentile_disc, tie-heavy") {
    val rnd = new scala.util.Random(13)
    val df = (1 to 900).map(i => (s"g${i % 4}", rnd.nextInt(23).toLong - 11))
      .toDF("g", "v")
    val got = ScaleRank.groupedQuantilesDisc(df, "g", "v",
      Seq(1 -> 20, 1 -> 2, 19 -> 20), Seq("lo", "mid", "hi"),
      v => floor(v / 4))
    val exp = df.groupBy("g").agg(
      expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS LONG)").as("elo"),
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS LONG)").as("emid"),
      expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS LONG)").as("ehi"))
    val j = got.join(exp, "g")
    assert(j.filter(col("lo") =!= col("elo") || col("mid") =!= col("emid") ||
      col("hi") =!= col("ehi")).count() == 0)
    assert(got.count() == 4)
  }

  test("groupedQuantilesCont == per-group percentile, dyadic fractions bit-exact") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 800).map(i => (s"g${i % 3}", rnd.nextInt(1000).toLong))
      .toDF("g", "v")
    val got = ScaleRank.groupedQuantilesCont(df, "g", "v",
      Seq(1 -> 4, 1 -> 2, 3 -> 4), Seq("q1", "med", "q3"),
      x => floor(x / 64))
    val exp = df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("e1"),
      expr("percentile(v, 0.5)").as("e2"),
      expr("percentile(v, 0.75)").as("e3"))
    val j = got.join(exp, "g")
    // dyadic fractions over integers: interpolation is FP-exact, so
    // require bit-equality with the builtin, not approximate equality
    assert(j.filter(col("q1") =!= col("e1") || col("med") =!= col("e2") ||
      col("q3") =!= col("e3")).count() == 0)
  }

  test("quantile helpers ignore NULL values, matching the builtins") {
    val rows: Seq[(String, java.lang.Long)] =
      (1L to 100L).map(i => ("a", java.lang.Long.valueOf(i))) ++
        Seq.fill(50)(("a", null: java.lang.Long)) ++
        (1L to 60L).map(i => ("b", java.lang.Long.valueOf(i * 2)))
    val df = rows.toDF("g", "v")
    val gotG = ScaleRank.exactQuantilesDisc(df.filter(col("g") === "a"), "v",
      Seq(1 -> 2), Seq("q")).head()
    val expG = df.filter(col("g") === "a").agg(
      expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS LONG)")).head()
    assert(gotG.getLong(0) == expG.getLong(0)) // 50, not shifted by nulls
    val got = ScaleRank.groupedQuantilesCont(df, "g", "v",
      Seq(1 -> 2), Seq("med"), x => floor(x / 16))
    val exp = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("e"))
    assert(got.join(exp, "g").filter(col("med") =!= col("e")).count() == 0)
  }

  test("joint-cell driver-collect bound refuses nRanges^nM > 1e6") {
    val df = (1 to 10).map(i =>
      (i.toLong, i.toLong, i.toLong, i.toLong, i.toLong, i.toLong))
      .toDF("k", "a", "b", "c", "d", "e")
    val fiveMetrics = Seq("a", "b", "c", "d", "e")
      .map(m => ScaleRank.RankOn(m, s"r$m"))
    // 32^5 ≈ 33M joint cells — must refuse before any job runs
    val ex = intercept[IllegalArgumentException] {
      ScaleRank.withGlobalRanksMulti(df, fiveMetrics, "k")
    }
    assert(ex.getMessage.contains("joint-cell"))
    // same 5 metrics are fine once nRanges keeps the cell bound: 8^5 = 32k
    val ok = ScaleRank.withGlobalRanksMulti(df, fiveMetrics, "k", nRanges = 8)
    assert(ok.filter(col("ra") =!= col("k")).count() == 0)
  }

  test("tie-mass skew guard: 90%-tied metric balances cells, ranks unchanged") {
    // one value carries 90% of the rows — a plain range partitioner
    // puts 90% of the data in a single window partition
    val n = 2000
    val df = (1 to n).map { i =>
      (i.toLong, if (i <= (n * 9) / 10) 42L else (i % 40).toLong, i.toLong)
    }.toDF("k", "v", "w")
    val w = Window.orderBy(col("v"), col("k"))
    val expected = df
      .withColumn("rk_exp", row_number().over(w).cast("long"))
      .withColumn("run_exp", sum(col("w")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = ScaleRank.withGlobalRanksMulti(df, Seq(
        ScaleRank.RankOn("v", "rk", runOns = Seq("w" -> "run"))),
      "k", nRanges = 8, keepCells = true)
    // bit-equality with the global sort
    val joined = expected.select("k", "rk_exp", "run_exp")
      .join(got, "k")
    assert(joined.filter(col("rk") =!= col("rk_exp") ||
      col("run") =!= col("run_exp")).count() == 0)
    // balance: no cell may hold anything near the 90% tie mass; the
    // guard sub-splits the heavy value by key hash, so the largest
    // cell should be a small multiple of n/nRanges
    val cellSizes = got.groupBy("__ck0").count()
      .collect().map(_.getAs[Long]("count"))
    assert(cellSizes.max < n / 2,
      s"largest cell ${cellSizes.max} of $n — skew guard did not split")
    assert(cellSizes.length > 8,
      s"only ${cellSizes.length} cells — heavy value was not sub-split")
  }

  test("ntileFromRank == ntile for every (n, b) shape incl. n < b") {
    for (n <- Seq(1, 4, 7, 10, 23, 100); b <- Seq(1, 3, 4, 5, 10)) {
      val df = (1 to n).map(_.toLong).toDF("k")
      val w = Window.orderBy("k")
      val bad = df
        .withColumn("exp", ntile(b).over(w).cast("long"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("got", ScaleRank.ntileFromRank(col("rk"), lit(n.toLong), b))
        .filter(col("exp") =!= col("got")).count()
      assert(bad == 0, s"n=$n b=$b")
    }
  }

  test("partitionedRunningSum == per-partition window, tie-heavy buckets") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 600).map { i =>
      (s"src${i % 3}", i.toLong, rnd.nextInt(50).toLong)
    }.toDF("src", "id", "tok")
    val w = Window.partitionBy("src").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum_exp", sum(col("tok")).over(w))
    val got = ScaleRank.partitionedRunningSum(df, "src", Seq("id"), "tok",
      floor(col("id") / 32L), "cum")
    val joined = expected.join(
      got.select(col("src").as("s2"), col("id").as("id2"), col("cum")),
      col("src") === col("s2") && col("id") === col("id2"))
    assert(joined.filter(col("cum") =!= col("cum_exp")).count() == 0)
  }
}
