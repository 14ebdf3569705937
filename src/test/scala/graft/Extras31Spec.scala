package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-29 operators: Theil-Sen slope
  * membership and pair accounting, LSH recall contract.
  */
class Extras31Spec extends SparkSpec {

  test("theil-sen: n_pairs = C(n,2); slope is a member of the pairwise slope set") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_theil_sen")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val counts = graft.io.Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (u, nPairs, _) =>
      val n = counts(u)
      assert(nPairs == n * (n - 1) / 2, s"user $u pair count")
    }
    // membership for one user
    val u0 = got.head._1
    val rows = graft.io.Tables.events(spark, sf0001)
      .filter(col("user_id") === u0)
      .select(unix_micros(col("ts")), expr("CAST(round(value*100) AS BIGINT)"),
        col("event_id"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    val slopes = for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if rows(j)._1 > rows(i)._1
    } yield math.round((rows(j)._2 - rows(i)._2) * 3600.0 * 1e6 * 1e6 /
      (rows(j)._1 - rows(i)._1))
    assert(slopes.contains(got.head._3), s"user $u0 slope membership")
  }

  test("lsh recall: banded MinHash finds every exact >=0.7 pair on this corpus") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_lsh_recall")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (nExact, nLsh, recall) = got.head
    assert(nExact > 0, "ground truth is non-empty")
    assert(nLsh == nExact && recall == 1000000L,
      "the 16x4 banding misses nothing at Jaccard >= 0.7 here")
  }
}
