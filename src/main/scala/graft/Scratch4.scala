package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: stage-level profile of the fuzzy-dedup paths at sf0.1. */
object Scratch4 {
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
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[t] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    graft.plans.GraftFunctions.register(spark)
    val inv = docs.select(col("doc_id").as("id"),
      explode(array_distinct(call_function("shingles", col("text")))).as("ng"))
    time("inverted index")(inv.count())
    time("sizes")(inv.groupBy("id").agg(count(lit(1))).count())
    val grouped = inv.groupBy("ng").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 100))
    time("grouped buckets")(grouped.count())
    time("full ngramJaccardPairs")(
      text.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("full dedupNgram")(
      text.Dedup.dedupNgram(docs, "doc_id", "text").count())
    time("minhash candidatePairs")(
      text.Dedup.candidatePairs(docs, "doc_id", "text").count())
    time("minhash nearDupPairs")(
      text.Dedup.nearDupPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
