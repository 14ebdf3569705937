package graft

import java.nio.file.{Files, Path}

import graft.streaming.{Stateful, Streams}

/** The GRAFT_STREAM_STATE_STORE toggle (Streams.stateStoreProvider)
  * swaps the state-store BACKEND under every stateful stream without
  * touching the query: results must be identical on either provider,
  * and the toggled run must actually land its state in RocksDB's
  * checkpoint format (snapshot zips / changelogs), not the default
  * provider's delta files.
  */
class StreamStateStoreSpec extends SparkSpec {

  private def withRocksDb[T](f: => T): T = {
    sys.props("graft.stream.stateStore") = "rocksdb"
    try f finally sys.props -= "graft.stream.stateStore"
  }

  /** Fresh checkpoint root per call: a reused root would make the
    * second run RESUME (AvailableNow + no new files → empty sink). */
  private def withCheckpointRoot[T](f: Path => T): T = {
    val root = Files.createTempDirectory("graft_test_statestore_")
    val key = "spark.sql.streaming.checkpointLocation"
    spark.conf.set(key, root.toString)
    try f(root) finally spark.conf.unset(key)
  }

  private def stateFiles(root: Path): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = Files.walk(root)
    try s.forEach(p => if (Files.isRegularFile(p)) out += p.toString)
    finally s.close()
    out.toSeq.filter(_.contains("state"))
  }

  test("resolver reads the toggle; default is the built-in provider") {
    assert(Streams.stateStoreProvider.isEmpty)
    withRocksDb {
      assert(Streams.stateStoreProvider.contains(Streams.RocksDbProvider))
    }
  }

  test("dedup / session-window / mapGroupsWithState streams: identical results, RocksDB state files") {
    // watermarked dedup, session windows, and an arbitrary-state
    // mapGroupsWithState — one query per stateful family the toggle
    // must cover (tws already forces RocksDB by API requirement).
    val dedupA = Streams.dedupedWithinWatermarkCounts(spark, sf0001)
      .collect().map(_.toString).toSeq
    val sessA = Streams.streamingSessionWindows(spark, sf0001)
      .collect().map(_.toString).toSeq
    val statsA = Stateful.userStats(spark, sf0001)
      .collect().map(_.toString).toSet
    val (dedupB, sessB, statsB, files) = withRocksDb {
      withCheckpointRoot { root =>
        val d = Streams.dedupedWithinWatermarkCounts(spark, sf0001)
          .collect().map(_.toString).toSeq
        val sw = Streams.streamingSessionWindows(spark, sf0001)
          .collect().map(_.toString).toSeq
        val st = Stateful.userStats(spark, sf0001)
          .collect().map(_.toString).toSet
        (d, sw, st, stateFiles(root))
      }
    }
    assert(dedupA == dedupB)
    assert(sessA == sessB)
    assert(statsA == statsB)
    // RocksDB checkpoints are version zips + changelogs (the toggle
    // enables changelog checkpointing — incremental uploads, not a
    // full snapshot per batch); the default provider writes .delta
    // files. Both present → some stream under the toggle silently ran
    // on the wrong provider.
    assert(files.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB state artifacts under:\n${files.take(20).mkString("\n")}")
    assert(files.exists(_.endsWith(".changelog")),
      s"changelog checkpointing not engaged:\n${files.take(20).mkString("\n")}")
    assert(!files.exists(_.endsWith(".delta")),
      s"default-provider delta files present under the rocksdb toggle:\n" +
        files.filter(_.endsWith(".delta")).take(10).mkString("\n"))
  }
}
