package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The events stream stages the snapshot parquet into a persistent
  * temp dir VERSIONED by the source's (size, ms-mtime). If the
  * testdata is regenerated IN PLACE between runs (the two-generation
  * scenario: nano-long ts vs timestamp[us]), the new generation gets a
  * FRESH stage directory — the old staged copy is neither read nor
  * unlinked, so no concurrent reader (this JVM or another sharing the
  * tmpdir) can ever lose its file mid-stream.
  */
class StreamStageSpec extends SparkSpec {

  private def stageFileFor(dir: String) = {
    val src = Paths.get(s"$dir/events.parquet")
    val a = Files.readAttributes(src,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_${dir.replaceAll("[^A-Za-z0-9]", "_")}" +
        s"_${a.size()}_${a.lastModifiedTime().toMillis}",
      "events.parquet")
  }

  test("a regenerated source gets a fresh stage; the old stage is never unlinked") {
    // test-local dataset dir so the "regenerated in place" scenario can
    // actually rewrite the source (the real testdata is read-only)
    val ds = Files.createTempDirectory("graft_stage_spec").toString
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      Paths.get(s"$ds/events.parquet"))
    def agg() = Streams.globalTypeTotals(spark, ds)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val first = agg()
    val stage1 = stageFileFor(ds)
    assert(Files.exists(stage1))
    assert(Files.size(stage1) == Files.size(Paths.get(s"$ds/events.parquet")))

    // regenerate in place: same schema family, different content AND a
    // different physical ts type (timestamp[us] vs the original) —
    // exactly the generation flip the versioned key must catch
    val out = Files.createTempDirectory("graft_stage_regen").toString
    io.Tables.events(spark, sf0001).filter(col("event_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val part = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(s"$ds/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val second = agg()
    val stage2 = stageFileFor(ds)
    // a DIFFERENT stage file serves the new generation...
    assert(stage2 != stage1 && Files.exists(stage2))
    // ...the old generation's stage was left alone (create-only scheme:
    // a reader mid-stream on the old file never loses it)...
    assert(Files.exists(stage1))
    // ...and the new stage's totals reflect the regenerated source
    val batch = io.Tables.events(spark, ds)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(second == batch)
    assert(second != first)
  }

  test("an up-to-date stage is NOT re-copied (mtime precision must not false-positive)") {
    Streams.globalTypeTotals(spark, sf0001).collect()
    val stageFile = stageFileFor(sf0001)
    val before = Files.getLastModifiedTime(stageFile)
    val beforeCreate = Files.readAttributes(stageFile,
      classOf[java.nio.file.attribute.BasicFileAttributes]).creationTime()
    Streams.globalTypeTotals(spark, sf0001).collect()
    val afterCreate = Files.readAttributes(stageFile,
      classOf[java.nio.file.attribute.BasicFileAttributes]).creationTime()
    assert(Files.getLastModifiedTime(stageFile) == before)
    assert(afterCreate == beforeCreate, "stage file was needlessly re-created")
  }

  test("stream over the staged file still matches the batch aggregation") {
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
