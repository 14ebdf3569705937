package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming (SURVEY.md §2.2 "stateful ops"):
  * per-user running counters via mapGroupsWithState — the primitive the
  * built-in windowed aggregations can't express (arbitrary per-key
  * state machines, e.g. funnel tracking or anomaly counters).
  *
  * State is partitioned by key across executors; each microbatch updates
  * only the keys it saw — the 100 TB shape (state store scales with
  * distinct keys, not events).
  */
object Stateful {

  final case class EventIn(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, n_purchases: Long,
      total_value: Double)

  def updateUser(id: Long, events: Iterator[EventIn],
      state: GroupState[UserStats]): UserStats = {
    val prev = state.getOption.getOrElse(UserStats(id, 0L, 0L, 0.0))
    val next = events.foldLeft(prev) { (acc, e) =>
      UserStats(id, acc.n_events + 1,
        acc.n_purchases + (if (e.event_type == "purchase") 1L else 0L),
        acc.total_value + e.value)
    }
    state.update(next)
    next
  }

  final case class EventTs(user_id: Long, event_id: Long, ts: java.sql.Timestamp)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long)

  /** flatMapGroupsWithState: emit one row PER SESSION (0..n outputs per
    * key per batch — the shape mapGroupsWithState can't express).
    * Sessions split on gaps > 30 min (matching session_window's
    * inclusive-merge semantics). This snapshot-driven form emits every
    * session it sees; a production stream would hold the open tail
    * session in `state` with an event-time timeout and emit it on
    * expiry. */
  def extractSessions(id: Long, events: Iterator[EventTs],
      state: GroupState[SessionOut]): Iterator[SessionOut] = {
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var start = sorted.head.ts
      var prev = sorted.head.ts
      var n = 1L
      sorted.tail.foreach { e =>
        if (e.ts.getTime - prev.getTime > 30L * 60 * 1000) {
          out += SessionOut(id, start, n)
          start = e.ts; n = 1L
        } else n += 1
        prev = e.ts
      }
      out += SessionOut(id, start, n)
      out.iterator
    }
  }

  /** Per-user sessions via flatMapGroupsWithState (append mode). */
  def userSessions(spark: SparkSession, dir: String): Dataset[SessionOut] = Streams.withStreamParallelism(spark) {
    import spark.implicits._
    val name = "graft_stream_usersessions"
    val q = Streams.eventsStream(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[EventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(extractSessions)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[SessionOut]
  }

  final case class EventVal(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  final case class ZState(n: Long, s: Long, s2: Long)
  final case class ZOut(event_id: Long, user_id: Long,
      z_micro: Option[Long])

  /** Streaming expanding z-score (the stateful twin of the batch
    * `window_zscore`): each event is scored against the running
    * mean/stddev of all PRIOR events for its user, held as exact
    * cent-scaled integer moment sums (n, Σv, Σv²) in per-key state —
    * order-independent, retry-safe, and bit-comparable to a batch
    * expanding-window computation. z = (v·n − s) / √(n·s2 − s²) — the
    * closed form keeps every intermediate an exact integer; only the
    * final √/÷ are floats, reported on the 1e-6 grid.
    *
    * The variance term n·s2 − s² is computed in BigInt: JVM Long
    * arithmetic WRAPS SILENTLY (no ANSI check like the SQL engines),
    * and with an expanding window the products cross 2⁶³ at ~3·10⁵
    * events per key for 1e4-cent values — silent wrong z-scores, the
    * worst failure mode (the batch feature_scale twin hit the same
    * cliff at the 10× spot-bench, loudly, because Spark SQL is ANSI).
    * The BigInt cost is three allocations per event on a path that
    * already sorts the batch. The state's own Σv² stays a Long —
    * exact to ~9·10⁶ events/key at 1e6-cent values, ~9·10¹⁰ at
    * 1e4-cent — two orders of magnitude past the den2 cliff this
    * removes; a key hotter than that needs a windowed, not expanding,
    * score (stream_zscore's contract is expanding-from-genesis). */
  def scoreExpanding(id: Long, events: Iterator[EventVal],
      state: GroupState[ZState]): Iterator[ZOut] = {
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(ZState(0L, 0L, 0L))
    val out = sorted.iterator.map { e =>
      val v = math.round(e.value * 100) // cents — exact for 2-dp values
      val den2 = BigInt(st.n) * BigInt(st.s2) - BigInt(st.s) * BigInt(st.s)
      val z =
        if (st.n >= 2 && den2 > 0) {
          val num = BigInt(v) * BigInt(st.n) - BigInt(st.s)
          val raw = num.toDouble / math.sqrt(den2.toDouble)
          // HALF_UP = away from zero, matching DuckDB round()
          Some(java.math.BigDecimal.valueOf(raw * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
        } else None
      st = ZState(st.n + 1, st.s + v, st.s2 + v * v)
      ZOut(e.event_id, id, z)
    }.toVector
    state.update(st)
    out.iterator
  }

  /** Per-event anomaly scores via flatMapGroupsWithState (append). */
  def expandingZscores(spark: SparkSession, dir: String): Dataset[ZOut] = Streams.withStreamParallelism(spark) {
    import spark.implicits._
    val name = "graft_stream_zscore"
    val q = Streams.eventsStream(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventVal]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(scoreExpanding)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[ZOut]
  }

  /** foreachBatch sink bridge: each microbatch lands as its OWN
    * parquet dir, OVERWRITTEN keyed by batchId — the canonical
    * idempotent-foreachBatch pattern, and the escape hatch for sinks
    * without a native streaming writer. A checkpoint dir makes
    * restarts resume from the last committed offset; the batchId-keyed
    * overwrite is what upgrades that from at-least-once to
    * effectively-exactly-once — a crash BETWEEN the batch write and
    * the offset commit replays the same batchId, which overwrites the
    * same dir instead of double-appending (a blind `append` here is
    * the classic foreachBatch dup bug). Read the landed set with
    * [[readForeachBatchSink]]. Returns the landed row count. */
  def sinkViaForeachBatch(spark: SparkSession, dir: String, outPath: String,
      checkpoint: Option[String] = None): Long = {
    val writer = Streams.eventsStream(spark, dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.write.mode("overwrite").parquet(s"$outPath/batch_$bid")
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    val q = writer.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    readForeachBatchSink(spark, outPath).map(_.count()).getOrElse(0L)
  }

  /** Like sinkViaForeachBatch but over an arbitrary source directory of
    * parquet event files (for incremental-ingest tests). */
  def sinkDirViaForeachBatch(spark: SparkSession, srcDir: String,
      outPath: String, checkpoint: String): Long = {
    graft.io.Tables.eventsNanosToTs(spark)
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        batch.write.mode("overwrite").parquet(s"$outPath/batch_$bid")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    readForeachBatchSink(spark, outPath).map(_.count()).getOrElse(0L)
  }

  /** Reads the union of a foreachBatch sink's per-batch dirs (None if
    * nothing landed yet). The explicit dir list keeps the batch id out
    * of the schema — unlike a k=v partition layout, whose inferred
    * column would leak into every consumer. Listing goes through the
    * Hadoop FileSystem of the sink path itself: a production sink
    * lives on HDFS/S3, where the old java.io.File spelling silently
    * listed nothing and reported an empty sink. */
  def readForeachBatchSink(spark: SparkSession,
      outPath: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(outPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
        .map(_.getPath.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.toIndexedSeq: _*))
  }

  final case class TypeCount(event_type: String, n: Long)

  /** Spark 4's transformWithState API (the successor to
    * mapGroupsWithState): explicit named state variables managed by a
    * StatefulProcessor, RocksDB-backed, with TTL/timers available. Here
    * a single ValueState counter per event_type — the minimal arbitrary
    * state machine in the new API. */
  class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, EventIn, TypeCount] {
    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[EventIn],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TypeCount] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single(TypeCount(key, n))
    }
  }

  /** Per-type running counts via transformWithState. RocksDB state
    * store is REQUIRED by the API (scoped to this stream, restored
    * after); counts are monotone, so max() per key collapses the
    * update-mode emission history to the final value. */
  def typeCountsTws(spark: SparkSession, dir: String): DataFrame = Streams.withStreamParallelism(spark) {
    import spark.implicits._
    val key = Streams.StateStoreKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Streams.RocksDbProvider)
    try {
      val name = "graft_stream_tws"
      val q = Streams.eventsStream(spark, dir)
        .select(col("user_id"), col("event_type"), col("value"))
        .as[EventIn]
        .groupByKey(_.event_type)
        .transformWithState(new TypeCountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        .writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name)
        .groupBy("event_type").agg(max(col("n")).as("n"))
        .orderBy("event_type")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Streaming per-user stats over the events parquet snapshot
    * (AvailableNow). Update output mode: one row per key per batch. */
  def userStats(spark: SparkSession, dir: String): Dataset[UserStats] = Streams.withStreamParallelism(spark) {
    import spark.implicits._
    val name = "graft_stream_userstats"
    val q = Streams.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateUser)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[UserStats]
  }
}
