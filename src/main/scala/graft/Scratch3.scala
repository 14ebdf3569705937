package graft

import org.apache.spark.sql.SparkSession

/** Dev: measure streaming-query cost vs shuffle-partition count. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm
    spark.read.parquet(s"$d/region.parquet").count()
    time("ssjoin @32")(noop(streaming.Streams.purchaseViewJoin(spark, d)))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("ssjoin @8")(noop(streaming.Streams.purchaseViewJoin(spark, d)))
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("ssjoin @4")(noop(streaming.Streams.purchaseViewJoin(spark, d)))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    time("dedup @32")(noop(streaming.Streams.dedupedEventCounts(spark, d)))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("dedup @8")(noop(streaming.Streams.dedupedEventCounts(spark, d)))
    spark.stop()
  }
}
