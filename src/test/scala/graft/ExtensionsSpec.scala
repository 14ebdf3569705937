package graft

import org.apache.spark.sql.SparkSession

/** The production registration path: `GraftExtensions` as a
  * SparkSessionExtensions hook (spark.sql.extensions=...). The
  * per-session `GraftFunctions.register` path is exercised by every
  * query; this pins that the extensions injection exposes the SAME
  * surface to a session that never called register — including the
  * round-9 capped aggregate. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects every native function into a fresh session") {
    val prev = spark
    // getOrCreate short-circuits to the active session, which would
    // silently skip the extensions hook — clear, build, restore.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       size(minhash_signature('a b c d')) AS n,
          |       size(shingles('a b c d')) AS ns""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(r.getInt(1) == 64 && r.getInt(2) == 2)
      // the capped aggregate resolves through SQL and truncates at cap+1
      val sizes = s2.range(10).selectExpr("id % 2 AS g", "id")
        .groupBy("g").agg(
          org.apache.spark.sql.functions.expr("capped_collect_longs(id, 3)").as("ids"))
        .collect().map(_.getSeq[Long](1).length).toSeq.sorted
      assert(sizes == Seq(4, 4)) // 5 per group, cap 3 → stopped at cap+1
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
