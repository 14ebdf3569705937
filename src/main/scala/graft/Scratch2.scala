package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling for the slow BENCH_r01 queries. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = io.Tables.documents(spark, d)
    docs.cache().count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = docs.withColumn("toks", split(col("text"), " "))
    time("baseline toks only")(noop(base.select(col("doc_id"), size(col("toks")).as("n"))))
    time("filter hof")(noop(base.select(col("doc_id"),
      size(filter(col("toks"), x => length(x) > 4)).as("n_long"))))
    time("transform upper")(noop(base.select(col("doc_id"),
      concat_ws(" ", transform(col("toks"), x => upper(x))).as("uc"))))
    time("exists")(noop(base.select(col("doc_id"),
      exists(col("toks"), x => x === "spark").as("h"))))
    time("aggregate nested transform")(noop(base.select(col("doc_id"),
      aggregate(transform(col("toks"), x => length(x).cast("long")),
        lit(0L), (acc, v) => acc + v).as("tc"))))
    time("aggregate direct")(noop(base.select(col("doc_id"),
      aggregate(col("toks"), lit(0L), (acc, v) => acc + length(v).cast("long")).as("tc"))))
    time("all four + orderBy (round-1 shape)")(noop(base
      .select(col("doc_id"),
        size(filter(col("toks"), x => length(x) > 4)).cast("long").as("n_long"),
        transform(col("toks"), x => upper(x)).as("toks_uc"),
        exists(col("toks"), x => x === "spark").as("has_spark"),
        aggregate(transform(col("toks"), x => length(x).cast("long")),
          lit(0L), (acc, v) => acc + v).as("total_chars"))
      .orderBy("doc_id")))
    spark.stop()
  }
}
