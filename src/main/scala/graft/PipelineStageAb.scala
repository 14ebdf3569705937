package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage decomposition of `pipeline_full_etl` (SERIAL.md two-decade
  * curve follow-up): the query's 100× wall ratio was adjudicated
  * prose-wise as "pair-level families dominate", but full_etl has NO
  * pair stage — its stages are scan → single-object CSV upload →
  * schema-inference read → dropna/sentiment/length transform →
  * single-object CSV result → read-back. This main times each
  * cumulative prefix so the per-stage walls (by subtraction) say
  * which stage actually carries the growth — the expected answer is
  * the two `coalesce(1)` CSV boundaries (reference parity:
  * one S3 object per job, app.py:53-62), which serialize O(n) bytes
  * through one task by DESIGN, plus the inference read's extra pass.
  *
  * Prefixes (each timed `reps` times, min reported):
  *   upload   = documents → writeSingle CSV
  *   read     = Csv.read(upload) → noop          (inference + scan)
  *   xform    = read → cleanAi → demo → noop      (adds the transform)
  *   result   = read → transform → writeSingle    (adds the result object)
  *   readback = Csv.read(result) → cast → noop    (the query's tail)
  *
  * Usage: runMain graft.PipelineStageAb <sfDir> [reps]
  */
object PipelineStageAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.PipelineStageAb <sfDir> [reps]")
      sys.exit(2)
    }
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-pipeline-stage-ab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_etl_ab_$tag"
    val docs = graft.io.Tables.documents(spark, dir)
    val n = docs.count()
    println(s"documents rows = $n  (dir=$dir, reps=$reps, min reported)")

    def timed(name: String)(body: => Unit): Double = {
      val walls = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        body
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[stage-ab] $name rep=$r wall=$w%.2f")
        w
      }
      walls.min
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val upload = timed("upload_write") {
      graft.io.Csv.writeSingle(docs, s"$base/upload")
    }
    val read = timed("read_infer") {
      noop(graft.io.Csv.read(spark, s"$base/upload"))
    }
    def transformed(): DataFrame =
      graft.pipeline.Pipelines.demo(graft.pipeline.Pipelines.cleanAi(
        graft.io.Csv.read(spark, s"$base/upload")))
    val xform = timed("read_transform") { noop(transformed()) }
    val result = timed("read_transform_write") {
      graft.io.Csv.writeSingle(transformed(), s"$base/processed")
    }
    val readback = timed("readback") {
      noop(graft.io.Csv.read(spark, s"$base/processed")
        .select(col("doc_id").cast("long"), col("lang"),
          col("comment_length").cast("long"), col("sentiment_result")))
    }
    println(f"upload_write=$upload%.2f read_infer=$read%.2f " +
      f"read_transform=$xform%.2f read_transform_write=$result%.2f " +
      f"readback=$readback%.2f")
    println(f"stage deltas: transform=${xform - read}%.2f " +
      f"result_write=${result - xform}%.2f")
    spark.stop()
  }
}
