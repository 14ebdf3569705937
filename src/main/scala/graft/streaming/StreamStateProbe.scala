package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-eviction measurement harness for the two stream-stream OUTER
  * joins (SERIAL.md "streaming state eviction"): replays the events
  * snapshot as N CHRONOLOGICAL micro-batches (the production arrival
  * order — the registered queries use a 2-batch snapshot+sentinel
  * stage, which exercises correctness but collapses the state curve
  * to one point) and prints each batch's StreamingQueryProgress
  * state-operator counters. The claim under test: join state is
  * bounded by the watermark horizon (1 h join range + watermark
  * delays), so numRowsTotal must RISE, PLATEAU at the in-horizon row
  * count, and be evicted batch-over-batch as the watermark advances —
  * never grow monotonically with the replayed length.
  *
  * Mirrors Streams.purchaseViewLeftJoin / purchaseViewFullJoin exactly
  * (same watermarks, same condition, same sentinel flush); only the
  * batch structure differs, which watermark semantics make
  * result-invariant (and the row counts printed let the reader check
  * output parity against the registered queries).
  *
  * Usage: runMain graft.streaming.StreamStateProbe <sfDir> [slices] [provider]
  * provider ∈ {hdfs (default), rocksdb} — rocksdb prices the escape
  * hatch for when density × horizon outgrows the executor heap: same
  * plateau semantics, state off-heap in RocksDB (SERIAL.md
  * state-store provider table).
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    // same dot-decimal pin as Bench (US, not ROOT — the Derby trap)
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val slices = if (args.length > 1) args(1).toInt else 8
    val provider = if (args.length > 2) args(2) else "hdfs"
    val providerClass = provider match {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case _ =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    }
    val spark = SparkSession.builder()
      .config("spark.sql.streaming.stateStore.providerClass", providerClass)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stream-state-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // recentProgress retains only the last N updates (default 100);
    // a finer replay than that would silently truncate the state
    // table and understate the peak — size the buffer to the replay
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (slices + 8).toString)

    val ev = graft.io.Tables.events(spark, dir)
    val n = ev.count()
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // chronological slices: global (ts, event_id) rank → equal-count
    // contiguous time ranges, so each micro-batch advances event time
    // (and thus the watermark) like a live stream would
    // rank is IntegerType; widen BEFORE multiplying — Int·Int wraps at
    // ~268M events (slices=8), silently dropping rows from every slice
    val ranked = ev.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("ts", "event_id")).cast("long"))
    val sliceDfs = (0 until slices).map { i =>
      ranked.filter(col("__rn") * slices > lit(i.toLong * n) &&
          col("__rn") * slices <= lit((i + 1).toLong * n))
        .drop("__rn") -> f"a_slice$i%02d.parquet"
    }
    val sentinel = spark.range(2).select(
      (col("id") - 2).as("event_id"),
      (lit(maxTs) + expr("INTERVAL 10 HOURS")).as("ts"),
      lit(-1L).as("user_id"),
      when(col("id") === 0, "purchase").otherwise("view").as("event_type"),
      lit(0.0).as("value"),
      lit("{}").as("props"))
      .select(ev.columns.map(col).toSeq: _*)

    println(s"state store provider = $provider ($providerClass)")

    def runJoin(joinType: String): Unit = {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val stageDir = Streams.stageArrivals(
        s"graft_state_probe_${joinType}_$tag",
        sliceDfs :+ (sentinel -> "z_tick.parquet"))
      val schema = spark.read.parquet(stageDir).schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stageDir)
      val p = src.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val v = src.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
        .withWatermark("v_ts", "2 hours")
      val name = s"graft_state_probe_$joinType"
      val q = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"),
        joinType)
        .select(col("p_id"), col("v_id"),
          coalesce(col("p_user"), col("v_user")).as("u"))
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table(name).filter(col("u") >= 0).count()
      println(s"== $joinType outer join: $n input events, $out result rows ==")
      println("| batch | input rows | state rows total | state rows removed | watermark |")
      println("|---|---|---|---|---|")
      var peak = 0L
      var last = 0L
      q.recentProgress.foreach { pr =>
        val so = pr.stateOperators.headOption
        val tot = so.map(_.numRowsTotal).getOrElse(0L)
        val rem = so.map(_.numRowsRemoved).getOrElse(0L)
        peak = math.max(peak, tot); last = tot
        val wm = Option(pr.eventTime.get("watermark")).getOrElse("-")
        println(s"| ${pr.batchId} | ${pr.numInputRows} | $tot | $rem | $wm |")
      }
      println(s"peak state rows = $peak of $n replayed " +
        f"(${100.0 * peak / n}%.1f%%), final = $last")
    }
    def timedJoin(joinType: String): Unit = {
      val t0 = System.nanoTime()
      runJoin(joinType)
      println(f"[$provider] $joinType wall = ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timedJoin("left_outer")
    timedJoin("full_outer")
    spark.stop()
  }
}
