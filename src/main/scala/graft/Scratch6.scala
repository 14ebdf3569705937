package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ad-hoc: probe Structured Streaming late-row drop semantics with a
  * 3-batch file layout: evens → 5 freshest rows → odds (late).
  */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val ev = io.Tables.events(spark, d)
    val tmpRoot = sys.props("java.io.tmpdir")
    val stageDir = Paths.get(tmpRoot, "graft_probe3")
    org.apache.commons.io.FileUtils.deleteDirectory(stageDir.toFile)
    Files.createDirectories(stageDir)
    def stage(df: DataFrame, fileName: String, mtimeMs: Long): Unit = {
      val outDir = Paths.get(tmpRoot, s"graft_probe3_build_$fileName")
      df.coalesce(1).write.mode("overwrite").parquet(outDir.toString)
      val ls = Files.list(outDir)
      val part = try ls.filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().get() finally ls.close()
      Files.move(part, stageDir.resolve(fileName),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(stageDir.resolve(fileName),
        FileTime.fromMillis(mtimeMs))
    }
    val now = System.currentTimeMillis()
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    stage(ev.filter(col("event_id") % 2 === 0), "a_even.parquet", now - 120000)
    stage(ev.filter(col("ts") === lit(maxTs)), "b_fresh.parquet", now - 60000)
    stage(ev.filter(col("event_id") % 2 === 1), "c_odd.parquet", now)

    val schema = spark.read.parquet(stageDir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("probe3")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach(p => System.err.println(
      s"[probe3] batch=${p.batchId} in=${p.numInputRows} eventTime=${p.eventTime} " +
        p.stateOperators.map(so => s"dropped=${so.numRowsDroppedByWatermark} " +
          s"updated=${so.numRowsUpdated} removed=${so.numRowsRemoved}").mkString(";")))
    val t = spark.table("probe3")
    System.err.println("[probe3] rows=" + t.count() +
      " distinct_ws=" + t.select("ws").distinct().count())
    spark.stop()
  }
}
