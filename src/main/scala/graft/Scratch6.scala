package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc: time named registry queries (noop sink) at a given sf dir.
  * Usage: runMain graft.Scratch6 <sfDir> <name> [name...]
  */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    Registry.all.filter(q => names(q.name)).foreach { q =>
      val t0 = System.nanoTime()
      q.fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[time] ${q.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
