package graft

import graft.ops.Joins
import graft.streaming.Streams
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Operator semantics on small literal inputs: as-of join, sessions,
  * multimodal stubs, CSV round-trip. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest order at-or-before each event") {
    val events = Seq(
      (100L, 1L, ts("2024-01-10 00:00:00")),
      (101L, 1L, ts("2024-01-20 00:00:00")),
      (102L, 2L, ts("2024-01-05 00:00:00"))   // before any order → null
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (1L, 1L, ts("2024-01-10 00:00:00")),    // same instant → counts (<=)
      (2L, 1L, ts("2024-01-15 00:00:00")),
      (3L, 2L, ts("2024-02-01 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")

    // same formulation as the registered query, against literal tables
    val e = events.select(col("user_id").as("k"), col("ts").as("t"),
      col("event_id"), lit(null).cast("timestamp").as("o_date"), lit(1).as("is_event"))
    val o = orders.select(col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(null).cast("long").as("event_id"), col("o_orderdate").as("o_date"),
      lit(0).as("is_event"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(col("t"), col("is_event"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = e.unionByName(o)
      .withColumn("last_order", last("o_date", ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select("event_id", "last_order")
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    assert(out(100L).contains(ts("2024-01-10 00:00:00")))
    assert(out(101L).contains(ts("2024-01-15 00:00:00")))
    assert(out(102L).isEmpty)
  }

  test("session windows: 30-min gap semantics (gap == 30:00 still merges; > splits)") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:29:59")),  // same session (< 30m)
      (1L, ts("2024-01-01 00:59:59")),  // gap exactly 30:00 → merges (inclusive)
      (1L, ts("2024-01-01 01:30:00")),  // gap 30:01 → NEW session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Streams.sessionCounts(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (2L, 4L))
    assert(out(2L) == (1L, 1L))
  }

  test("multimodal decoded features are deterministic and shaped right") {
    val docs = Multimodal.synthMediaTable(spark,
      io.Tables.documents(spark, sf0001).limit(20))
    val f1 = Multimodal.extractFeatures(spark, docs).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, docs).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    f1.foreach { m =>
      assert(m.n_units > 0 && m.mean_val > 0)
      assert(m.min_val <= m.max_val && m.max_val <= 255)
      assert(Set("image", "audio", "video")(m.media_type))
    }
  }

  test("multimodal resize: aspect preserved, long side = target, checksum deterministic") {
    val docs = Multimodal.synthMediaTable(spark,
      io.Tables.documents(spark, sf0001).limit(30))
    val r1 = Multimodal.resizeImages(spark, docs).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resizeImages(spark, docs).collect().sortBy(_.doc_id)
    assert(r1.toSeq == r2.toSeq)
    assert(r1.nonEmpty)
    r1.foreach { m =>
      assert(math.max(m.out_w, m.out_h) == 224)
      assert(m.out_w >= 1 && m.out_h >= 1)
      // floor scaling never flips the orientation
      assert((m.width >= m.height) == (m.out_w >= m.out_h))
      assert(m.n_out_bytes == m.out_w * m.out_h)
      assert(m.checksum >= 0 && m.checksum <= 255L * m.n_out_bytes)
    }
  }

  test("csv round-trip preserves data (header+inferSchema parity)") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_test_csv"
    val df = Seq((1, "a,b", "x"), (2, "q\"uote", "y")).toDF("id", "s1", "s2")
    graft.io.Csv.writeSingle(df, path)
    val back = graft.io.Csv.read(spark, path).orderBy("id")
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1, "a,b", "x"), (2, "q\"uote", "y")))
  }

  test("permissive csv: malformed rows land in _corrupt_record, job survives") {
    import org.apache.spark.sql.types._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_corrupt"
    val f = new java.io.File(dir)
    f.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,score\n1,10\nnot_a_number,oops,extra\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", IntegerType)))
    // caching is required before filtering on the corrupt-record column
    // (Spark disallows corrupt-record-only queries on the raw scan)
    val df = graft.io.Csv.readPermissive(spark, dir, schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.collect().head.getAs[String]("_corrupt_record")
      .startsWith("not_a_number"))
  }

  test("processData returns success boolean and writes output (etl_core.py:17)") {
    val in = s"${sys.props("java.io.tmpdir")}/graft_test_in"
    val out = s"${sys.props("java.io.tmpdir")}/graft_test_out"
    Seq(("great fast product", 5), ("slow broken thing", 1))
      .toDF("review", "rating").write.mode("overwrite")
      .option("header", "true").csv(in)
    assert(graft.pipeline.Pipelines.processData(spark, in, out))
    val got = graft.io.Csv.read(spark, out).orderBy("rating")
      .select("sentiment_result").collect().map(_.getString(0)).toSeq
    assert(got == Seq("NEGATIVE", "POSITIVE"))
  }

  test("writeSingle keeps the upstream plan parallel (repartition, " +
      "never coalesce): compute tasks > 1, write tasks == 1") {
    // the coalesce(1) regression silently single-threads the whole
    // upstream into the one write task (measured 20× the pipeline at
    // 100× — SERIAL.md stage decomposition); pin the shape with a
    // task-count listener: an 8-partition source must execute ≥2
    // stages, the largest parallel and the write stage single-task
    import scala.collection.mutable
    val stages = mutable.Map[Int, Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages(sc.stageInfo.stageId) = sc.stageInfo.numTasks }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = spark.range(0, 10000, 1, 8).toDF("v")
        .withColumn("w", col("v") * 2)
      graft.io.Csv.writeSingle(df,
        s"${sys.props("java.io.tmpdir")}/graft_test_single")
      // listener events are async — poll briefly for both stages
      val deadline = System.nanoTime() + 10e9.toLong
      def counts() = stages.synchronized(stages.values.toSeq)
      while (System.nanoTime() < deadline &&
        (counts().isEmpty || counts().max != 8 || counts().min != 1))
        Thread.sleep(50)
      assert(counts().max == 8, s"compute stage lost parallelism: ${counts()}")
      assert(counts().min == 1, s"no single-task write stage: ${counts()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
