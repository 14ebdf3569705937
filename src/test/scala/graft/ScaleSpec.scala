package graft

import graft.io.Catalog
import graft.ops.Scale
import org.apache.spark.sql.functions._

/** Scale-mechanics semantics: salted join equivalence under skew,
  * catalog merge behavior. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on a pathologically skewed key") {
    // 1000 rows all hitting ONE key + a few normal keys
    val fact = ((1 to 1000).map(i => (i.toLong, 7L)) ++
      Seq((2000L, 1L), (2001L, 2L))).toDF("row_id", "k")
    val dim = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "unused"))
      .toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Scale.saltedJoin(fact, dim, "k", "dk",
      saltSource = col("row_id"), buckets = 8)
      .select("row_id", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 1002)
  }

  test("catalog merge: update wins, insert lands, untouched passes through") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val jobs = Seq(
      (1L, "a.csv", "Pending", null: String, ts, 10L),
      (2L, "b.csv", "Completed", "s3://done/b", ts, 11L)
    ).toDF("id", "filename", "status", "result_url", "upload_time", "user_id")
    val updates = Seq(
      (1L, "a.csv", "Completed", "s3://done/a", ts, 10L), // update
      (3L, "c.csv", "Pending", null: String, ts, 12L)     // insert
    ).toDF("id", "filename", "status", "result_url", "upload_time", "user_id")
    val merged = Catalog.mergeJobs(jobs, updates)
      .collect().map(r => r.getLong(0) -> (r.getString(2), Option(r.getString(3)))).toMap
    assert(merged(1L) == ("Completed", Some("s3://done/a")))
    assert(merged(2L) == ("Completed", Some("s3://done/b")))
    assert(merged(3L) == ("Pending", None))
  }

  test("spread is a no-op when partitions already suffice") {
    val df = io.Tables.customer(spark, sf0001).repartition(64)
    assert(io.Tables.spread(df).rdd.getNumPartitions == 64)
  }
}
