package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract: ONE JSON line on stdout).
  * Runs every registered query against SPARK_GRAFT_SF_DIR and times a
  * full materialization (noop sink — executes the whole plan including
  * sinks/shuffles, no driver collect, no disk write in the timing).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up on the smallest table so the first timed query
    // doesn't pay one-time session costs.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val results = Registry.all.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Stop Spark BEFORE printing so nothing (shutdown logging included)
    // can land on stdout after the json line — the driver parses the
    // last line of stdout.
    spark.stop()
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
