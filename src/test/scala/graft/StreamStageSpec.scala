package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The events stream stages the snapshot parquet into a persistent
  * temp dir. If the testdata is regenerated IN PLACE between runs
  * (the two-generation scenario: nano-long ts vs timestamp[us]), a
  * stale staged copy must be detected (size/mtime mismatch vs the
  * source) and re-staged — not silently read with the new schema.
  */
class StreamStageSpec extends SparkSpec {

  private val stageFile = Paths.get(
    sys.props("java.io.tmpdir"),
    s"graft_stream_${sf0001.replaceAll("[^A-Za-z0-9]", "_")}",
    "events.parquet")

  test("a tampered staged events file is re-staged from the source") {
    def agg() = Streams.globalTypeTotals(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val first = agg()
    assert(Files.exists(stageFile))
    val src = Paths.get(s"$sf0001/events.parquet")
    assert(Files.size(stageFile) == Files.size(src))

    // simulate a stale stage from an older generation: different
    // content AND different size/mtime than the current source
    Files.write(stageFile, Array[Byte](0, 1, 2, 3),
      StandardOpenOption.TRUNCATE_EXISTING)
    assert(Files.size(stageFile) != Files.size(src))

    // the next stream must detect the mismatch, re-stage, and produce
    // the same result — a reused stale file would fail the parquet read
    val second = agg()
    assert(second == first)
    assert(Files.size(stageFile) == Files.size(src))
    // ms granularity — COPY_ATTRIBUTES truncates sub-ms on some filesystems
    assert(Files.getLastModifiedTime(stageFile).toMillis ==
      Files.getLastModifiedTime(src).toMillis)
  }

  test("an up-to-date stage is NOT re-copied (mtime precision must not false-positive)") {
    Streams.globalTypeTotals(spark, sf0001).collect()
    val before = Files.getLastModifiedTime(stageFile)
    val beforeCreate = Files.readAttributes(stageFile,
      classOf[java.nio.file.attribute.BasicFileAttributes]).creationTime()
    Streams.globalTypeTotals(spark, sf0001).collect()
    val afterCreate = Files.readAttributes(stageFile,
      classOf[java.nio.file.attribute.BasicFileAttributes]).creationTime()
    assert(Files.getLastModifiedTime(stageFile) == before)
    assert(afterCreate == beforeCreate, "stage file was needlessly re-created")
  }

  test("stream over the re-staged file still matches the batch aggregation") {
    val streamed = Streams.globalTypeTotals(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = io.Tables.events(spark, sf0001)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("long").as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }
}
