package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = io.Tables.documents(spark, d)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    }
    time("docs count")(docs.count())
    time("signatures")(text.Dedup.withSignature(docs, "doc_id", "text").count())
    time("buckets")(text.Dedup.withSignature(docs, "doc_id", "text")
      .select(col("id"), explode(text.Dedup.bandsCol(col("mh_sig"))).as("bk")).count())
    val exploded = text.Dedup.withSignature(docs, "doc_id", "text")
      .select(col("id"), explode(text.Dedup.bandsCol(col("mh_sig"))).as("bk"))
    locally {
      val q = exploded.groupBy(col("bk")).count().filter(col("count") >= 2)
      val plan = q.queryExecution.optimizedPlan.toString
      println("== optimized plan size: " + plan.length + " chars")
      println("== xxhash64 occurrences: " + "xxhash64".r.findAllIn(plan).size)
      println("== Generate line: " + plan.linesIterator.filter(_.contains("Generate")).map(_.take(300)).mkString(" | "))
    }
    time("groupBy count only")(
      exploded.groupBy(col("bk")).count().filter(col("count") >= 2).count())
    time("groupBy count only AGAIN")(
      exploded.groupBy(col("bk")).count().filter(col("count") >= 2).count())
    time("groupBy on 1-band key (small group expr)")(
      text.Dedup.withSignature(docs, "doc_id", "text")
        .select(col("id"), col("mh_sig")(0).as("b0"))
        .groupBy("b0").count().count())
    time("groupBy collect_list")(
      exploded.groupBy(col("bk")).agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")).between(2, 100)).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("collect_list NO codegen")(
      exploded.groupBy(col("bk")).agg(collect_list(col("id")).as("ids"))
        .filter(size(col("ids")).between(2, 100)).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("candidates")(text.Dedup.candidatePairs(docs, "doc_id", "text").count())
    time("nearDupPairs")(text.Dedup.nearDupPairs(docs, "doc_id", "text").count())
    time("dedup full")(text.Dedup.dedupMinHash(docs, "doc_id", "text").count())
    spark.stop()
  }
}
