package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-2 operators that the oracles can't
  * express directly: Z-value bit math, upsert batch-order invariance,
  * interpolation on hand-computable points. */
class Extras5Spec extends SparkSpec {

  test("z-values interleave bits (a -> even bits, b -> odd bits)") {
    import spark.implicits._
    // (nationkey, custkey%32) -> expected interleave
    val rows = SparkEntry.queries("sink_zorder")(spark, sf0001)
      .select("c_custkey", "c_nationkey", "zval")
      .as[(Long, Long, Long)].collect()
    def z(a: Long, b: Long): Long =
      (0 until 5).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    rows.foreach { case (ck, nk, zv) =>
      assert(zv == z(nk, ck % 32), s"custkey=$ck nation=$nk")
    }
    // adjacent nations with same custkey bits differ only in low bits:
    // locality — z(n, k) and z(n+1, k) differ by at most 4^5
    assert(z(3, 7) != z(4, 7) && math.abs(z(3, 7) - z(3, 8)) <= (1L << 11))
  }

  test("z-value interleave is injective over the full 5+5-bit domain") {
    def z(a: Long, b: Long): Long =
      (0 until 5).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val all = for (a <- 0L until 32L; b <- 0L until 32L) yield z(a, b)
    assert(all.distinct.size == 1024 && all.min == 0L && all.max == 1023L)
  }

  test("salted join equals the plain join for every bucket count") {
    import spark.implicits._
    // planted skew: one hot key with 500 rows, a long tail of singletons
    val left = ((1 to 500).map(i => (1L, i.toLong)) ++
      (2 to 50).map(k => (k.toLong, 0L))).toDF("k", "payload")
    val right = (1 to 50).map(k => (k.toLong, s"dim_$k")).toDF("rk", "name")
    val expected = left.join(right, left("k") === right("rk"))
      .select("k", "payload", "name").collect().map(_.toString).sorted.toSeq
    for (buckets <- Seq(1, 2, 7, 16)) {
      val got = graft.ops.Scale
        .saltedJoin(left, right, "k", "rk", col("payload"), buckets)
        .select("k", "payload", "name").collect().map(_.toString).sorted.toSeq
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("streaming upsert state equals the batch latest-per-key regardless of batch split") {
    // the registered query stages evens-then-odds through
    // maxFilesPerTrigger=1; the oracle is the single-batch answer —
    // equality at any split is the CDC-apply associativity contract.
    val streamed = SparkEntry.queries("stream_upsert_state")(spark, sf0001)
    val batch = graft.io.Tables.events(spark, sf0001)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("linear interpolation is exact on a hand-computed gap") {
    import spark.implicits._
    // one user, observations at hours 0 and 3: v6 = 1_000_000 and
    // 4_000_000 -> grid hours 1,2 interpolate to exactly 2M and 3M
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 03:20:00"), 4.0))
      .toDF("user_id", "ts", "value")
    val grid = df.groupBy("user_id")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val hourly = df.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(round(col("value") * 1e6).cast("long")).as("v6"))
    val w = org.apache.spark.sql.expressions.Window
    val wb = w.partitionBy("user_id").orderBy(col("hr").asc)
      .rowsBetween(Long.MinValue, 0)
    val wf = w.partitionBy("user_id").orderBy(col("hr").desc)
      .rowsBetween(Long.MinValue, 0)
    val out = grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        last(when(col("v6").isNotNull, col("hr")), ignoreNulls = true).over(wb).as("tp"),
        last(col("v6"), ignoreNulls = true).over(wb).as("vp"),
        last(when(col("v6").isNotNull, col("hr")), ignoreNulls = true).over(wf).as("tn"),
        last(col("v6"), ignoreNulls = true).over(wf).as("vn"))
      .select(col("hr"),
        when(col("tn") === col("tp"), col("vp"))
          .otherwise(expr("""(vp * (unix_timestamp(tn) - unix_timestamp(hr))
                           | + vn * (unix_timestamp(hr) - unix_timestamp(tp)))
                           | div (unix_timestamp(tn) - unix_timestamp(tp))""".stripMargin))
          .as("val_e6"))
      .orderBy("hr")
      .as[(java.sql.Timestamp, Long)].collect().map(_._2).toSeq
    assert(out == Seq(1000000L, 2000000L, 3000000L, 4000000L))
  }
}
