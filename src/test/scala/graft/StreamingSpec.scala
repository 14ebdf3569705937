package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Streaming/batch parity: Structured Streaming's core guarantee is
  * that the streaming plan over a finite source equals the batch plan
  * over the same data. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg == batch hourly agg") {
    val streamed = Streams.hourlyEventAgg(spark, sf0001)
      .select("ws", "n").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val batch = io.Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("ws"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stream-stream left outer join == batch left join incl. null-padded tail") {
    val streamed = Streams.purchaseViewLeftJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getLong(2)))
      .toSet
    val ev = io.Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val batch = p.join(v,
        col("p_user") === col("v_user") && col("v_ts") <= col("p_ts") &&
          col("v_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"), "left_outer")
      .select("p_id", "v_id", "p_user").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString), r.getLong(2)))
      .toSet
    assert(streamed == batch)
    assert(batch.exists(_._2.isEmpty), "unmatched-purchase path actually fires")
  }

  test("stream-stream full outer join == batch full join, both null sides present") {
    val streamed = Streams.purchaseViewFullJoin(spark, sf0001).collect()
      .map(r => (Option(r.get(0)).map(_.toString),
        Option(r.get(1)).map(_.toString), r.getLong(2))).toSet
    val ev = io.Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val batch = p.join(v,
        col("p_user") === col("v_user") && col("v_ts") <= col("p_ts") &&
          col("v_ts") > col("p_ts") - expr("INTERVAL 1 HOUR"), "full_outer")
      .select(col("p_id"), col("v_id"),
        coalesce(col("p_user"), col("v_user")).as("u")).collect()
      .map(r => (Option(r.get(0)).map(_.toString),
        Option(r.get(1)).map(_.toString), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.exists(_._1.isEmpty), "unmatched-view path fires")
    assert(batch.exists(_._2.isEmpty), "unmatched-purchase path fires")
  }

  test("streaming dedup emits each event once") {
    val streamed = Streams.dedupedEventCounts(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = io.Tables.events(spark, sf0001)
      .groupBy("event_type").agg(countDistinct("event_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("foreachBatch sink lands every row exactly once") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_test_feb_${System.nanoTime()}"
    val landed = graft.streaming.Stateful.sinkViaForeachBatch(spark, sf0001, out)
    val expected = io.Tables.events(spark, sf0001).count()
    assert(landed == expected)
  }

  test("foreachBatch sink is idempotent under batch REPLAY (crash between write and offset commit)") {
    import java.nio.file.{Files, Paths}
    val base = s"${sys.props("java.io.tmpdir")}/graft_test_febr_${System.nanoTime()}"
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(src))
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$src/events_1.parquet"))
    val n1 = graft.streaming.Stateful.sinkDirViaForeachBatch(spark, src, out, ckpt)
    assert(n1 == 1000L)
    // simulate the at-least-once crash window: the stream dies AFTER
    // batch 0's write but BEFORE its offset commit, so the restart
    // re-executes the SAME batchId. With the old blind append this
    // double-landed the rows; the batchId-keyed overwrite makes the
    // replayed write a no-op on the landed set.
    spark.read.parquet(s"$src/events_1.parquet")
      .write.mode("overwrite").parquet(s"$out/batch_0")
    spark.catalog.refreshByPath(out)
    val landed = graft.streaming.Stateful.readForeachBatchSink(spark, out)
      .get.count()
    assert(landed == 1000L, s"replayed batch double-landed: $landed")
  }

  test("flatMapGroupsWithState sessions: per-user session count matches session_window") {
    val flat = graft.streaming.Stateful.userSessions(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sw = Streams.sessionCounts(io.Tables.events(spark, sf0001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat == sw)
  }

  test("checkpointed stream: restart is exactly-once, new files are incremental") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_test_ckpt_${System.nanoTime()}"
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(src).mkdirs()
    def addFile(n: Int): Unit = java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$src/events_$n.parquet"))
    addFile(1)
    val n1 = graft.streaming.Stateful.sinkDirViaForeachBatch(spark, src, out, ckpt)
    // restart with NO new files: checkpoint prevents reprocessing
    val n2 = graft.streaming.Stateful.sinkDirViaForeachBatch(spark, src, out, ckpt)
    // a new file arrives: only IT is processed on the next run
    addFile(2)
    val n3 = graft.streaming.Stateful.sinkDirViaForeachBatch(spark, src, out, ckpt)
    assert(n1 == 1000L, s"first run landed $n1")
    assert(n2 == 1000L, s"restart reprocessed: $n2")
    assert(n3 == 2000L, s"incremental run landed $n3")
  }

  test("late-data drop: late rows excluded, on-time rows kept, windows final") {
    val got = graft.streaming.Streams.lateDropHourlyCounts(spark, sf0001)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val ev = io.Tables.events(spark, sf0001)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val expected = ev
      .filter(col("event_id") % 2 === 0 ||
        col("ts") >= lit(maxTs) - expr("INTERVAL 3 HOURS"))
      .groupBy(date_trunc("hour", col("ts")).as("ws"))
      .agg(count(lit(1)).as("n"))
      .filter(col("ws") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 1 HOUR"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // and it genuinely dropped something: the full batch agg differs
    val full = ev.groupBy(date_trunc("hour", col("ts"))).count().count()
    assert(got.size < full)
  }

  test("stateful user stats match batch counts") {
    val got = graft.streaming.Stateful.userStats(spark, sf0001)
      .collect().map(u => u.user_id -> (u.n_events, u.n_purchases)).toMap
    val batch = io.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == batch)
  }

  test("expanding z-score survives moment products past 2^63 (no silent Long wrap)") {
    import graft.streaming.Stateful.{EventVal, ZState}
    // a hot key deep into its history: n·s2 and s·s both exceed
    // Long.MaxValue (1.68e25 / 1.6e25); den2 = 8e23 needs 128 bits.
    // JVM Long arithmetic wraps SILENTLY here to 1.6e18 — ~500×
    // small, i.e. a plausible-looking but ~22×-inflated z-score, the
    // worst failure mode. This pins that the score path computes the
    // true 128-bit value instead.
    val st = ZState(n = 4000000L, s = 4000000000000L, s2 = 4200000000000000000L)
    val den2 = BigInt(st.n) * BigInt(st.s2) - BigInt(st.s) * BigInt(st.s)
    assert(BigInt(st.n * st.s2 - st.s * st.s) != den2) // the silent wrap pinned away
    val state = org.apache.spark.sql.streaming.TestGroupState.create[ZState](
      org.apache.spark.api.java.Optional.of(st),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      0L, org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)
    val ev = EventVal(7L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 12000.00)
    val out = graft.streaming.Stateful.scoreExpanding(7L, Iterator(ev), state).toVector
    val expected = java.math.BigDecimal.valueOf(
      (BigInt(1200000L) * BigInt(st.n) - BigInt(st.s)).toDouble /
        math.sqrt(den2.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    assert(out.map(_.z_micro) == Vector(Some(expected)))
    // and the updated state is the exact next moment triple
    assert(state.get == ZState(st.n + 1, st.s + 1200000L,
      st.s2 + 1200000L * 1200000L))
  }

  test("streaming index ingest == batch sequential fold, and rejection fires") {
    import graft.text.Dedup
    val docs = io.Tables.documents(spark, sf0001).select("doc_id", "text")
    val streamed = Streams.indexIngestAccepted(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch replay of the same fold: each day screens against
    // base ∪ all PRIOR days' accepted docs (rejected docs never block)
    val base = docs.filter(col("doc_id") % 4 === 0)
    def day(m: Int) = docs.filter(col("doc_id") % 4 === m)
    val acc1 = Dedup.incrementalAccept(base, day(1), "doc_id", "text")
    val acc2 = Dedup.incrementalAccept(base.unionByName(acc1), day(2),
      "doc_id", "text")
    val acc3 = Dedup.incrementalAccept(
      base.unionByName(acc1).unionByName(acc2), day(3), "doc_id", "text")
    val expected = Seq(acc1 -> 1L, acc2 -> 2L, acc3 -> 3L).flatMap {
      case (df, m) => df.select("doc_id").collect().map(_.getLong(0) -> m)
    }.toSet
    assert(streamed == expected)
    // the screen is not a pass-through: the planted near-dups reject
    val deltaTotal = docs.filter(col("doc_id") % 4 =!= 0).count()
    assert(streamed.size < deltaTotal,
      "no delta doc was rejected — the ingest screen never fired")
  }

  test("streaming embedding ingest == batch sequential fold through the persisted index") {
    import graft.sim.EmbIndex
    import java.nio.file.{Files, Paths}
    val emb = io.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val streamed = Streams.embIndexIngestAccepted(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch replay: grow a fresh index day by day with the SAME
    // screen-and-append ops the stream's foreachBatch runs
    val root = Files.createTempDirectory(
      Paths.get(sys.props("java.io.tmpdir")), "graft_embingest_replay_").toString
    EmbIndex.writeIndex(emb.filter(col("vec_id") % 4 === 0), root)
    val expected = (1 to 3).flatMap { m =>
      val acc = EmbIndex.incrementalAcceptIndexed(
        EmbIndex.readIndex(spark, root),
        emb.filter(col("vec_id") % 4 === m), 1, 5)
      EmbIndex.appendIndex(root, acc)
      spark.read.parquet(EmbIndex.vecsLive(root))
        .filter(col("vec_id") % 4 === m)
        .select("vec_id").collect().map(_.getLong(0) -> m.toLong)
    }.toSet
    assert(streamed == expected)
  }

  test("streaming PQ ingest == batch replay at the same frozen codebook") {
    import graft.sim.PqIndex
    import java.nio.file.{Files, Paths}
    val emb = io.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val streamed = Streams.pqIndexIngestCodes(spark, sf0001).collect()
      .map(_.toSeq).toSet
    val root = Files.createTempDirectory(
      Paths.get(sys.props("java.io.tmpdir")), "graft_pqingest_replay_").toString
    PqIndex.writeIndex(emb.filter(col("vec_id") % 4 === 0), root)
    (1 to 3).foreach(m =>
      PqIndex.appendIndex(root, emb.filter(col("vec_id") % 4 === m)))
    val expected = spark.read.parquet(PqIndex.codesLive(root))
      .select(col("vec_id"), col("sub"), col("code"), col("d2"),
        (col("vec_id") % 4).cast("long").as("day")).collect()
      .map(_.toSeq).toSet
    assert(streamed == expected)
    // every vector carries exactly M code rows — no batch double-encoded
    assert(streamed.size == emb.count() * 4)
  }

  test("streaming serving is batch-size invariant: micro-batched == one-shot batch probe") {
    import graft.sim.{EmbIndex, EmbIndexQueries}
    val emb = io.Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val streamed = Streams.embIndexServing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // serving is stateless reads, so answering ALL queries in one
    // batch must give the identical ranked set
    val oneShot = EmbIndex.indexTopKBatch(
        EmbIndex.readIndex(spark, EmbIndexQueries.stagedEmbIndexPath(spark, sf0001)),
        emb.filter(col("vec_id") % 5 === 0), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
  }

  test("mm near-dup serving is batch-size invariant: micro-batched == " +
      "one-shot lookup (withinDelta=false is a pure per-object function)") {
    import graft.multimodal.{MmIndex, MultimodalQueries}
    val streamed = Streams.mmIndexServing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val oneShot = MmIndex.nearProbeReport(
        MmIndex.readIndex(spark,
          MultimodalQueries.stagedMmIndexPath(spark, sf0001)),
        spark.read.parquet(
          MultimodalQueries.stagedNearDupPath(spark, sf0001) + "/media"),
        withinDelta = false).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(streamed == oneShot)
    // both verdicts occur — the planted distances straddle the tolerance
    assert(streamed.exists(_._5) && streamed.exists(!_._5))
  }

  test("text near-dup serving is batch-size invariant: micro-batched == " +
      "one-shot lookup (no intra-delta blocking in the lookup posture)") {
    import graft.text.{Dedup, DedupQueries}
    val docs = io.Tables.documents(spark, sf0001).select("doc_id", "text")
    val streamed = Streams.textIndexServing(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toSet
    val oneShot = Dedup.lookupReport(
        Dedup.readIndex(spark, DedupQueries.stagedIndexPath(spark, sf0001)),
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
      .toSet
    assert(streamed == oneShot)
    // both verdicts occur — the corpus plants near-dups across the split
    assert(streamed.exists(_._4) && streamed.exists(!_._4))
  }

  test("ingest drive is restart-idempotent: a re-drive against the same checkpoint ingests nothing") {
    import java.nio.file.{Files, Paths}
    val docs = io.Tables.documents(spark, sf0001).select("doc_id", "text")
    val srcDir = Streams.stageArrivals("graft_ingest_idem_src",
      Seq(docs.filter(col("doc_id") % 2 === 0) -> "a.parquet",
        docs.filter(col("doc_id") % 2 === 1) -> "b.parquet"))
    val ckpt = Files.createTempDirectory(
      Paths.get(sys.props("java.io.tmpdir")), "graft_ingest_idem_ckpt_").toString
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    Streams.driveIngest(spark, srcDir, ckpt)(_ => calls.incrementAndGet())
    assert(calls.get() == 2, "two staged days must arrive as two micro-batches")
    // the restart: same checkpoint, same source — no committed batch re-runs
    Streams.driveIngest(spark, srcDir, ckpt)(_ => calls.incrementAndGet())
    assert(calls.get() == 2, "a re-drive must re-ingest nothing")
  }
}
