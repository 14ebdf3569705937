package graft

import org.apache.spark.sql.functions._

/** Wave-49: 13-gram decontamination, Poisson bootstrap, threshold
  * sweep. */
class Extras49Spec extends SparkSpec {

  test("decontaminate13: only train docs, every hit shares a real 13-gram") {
    val hits = SparkEntry.queries("dedup_decontaminate13")(spark, sf0001)
      .collect()
    hits.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 != 0) // eval docs never reported
      assert(r.getAs[Long]("n_hits13") >= 1)
    }
    // a doc under 13 tokens can never appear
    val shortDocs = graft.io.Tables.documents(spark, sf0001)
      .filter(size(split(lower(trim(col("text"))), " +")) < 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hits.forall(r => !shortDocs.contains(r.getAs[Long]("doc_id"))))
  }

  test("bootstrap CI: 100 replicates, ordered bounds bracketing the mean") {
    val r = SparkEntry.queries("stat_bootstrap_ci")(spark, sf0001)
      .collect().head
    assert(r.getAs[Long]("n_reps") == 100)
    val (lo, med, hi) = (r.getAs[Long]("lo_cents"),
      r.getAs[Long]("med_cents"), r.getAs[Long]("hi_cents"))
    assert(lo <= med && med <= hi)
    // the point estimate falls inside its own 95% interval
    val mean = graft.io.Tables.orders(spark, sf0001)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      .agg(avg("rev")).collect().head.getDouble(0)
    assert(mean >= lo && mean <= hi)
  }

  test("threshold sweep: counts monotone non-increasing in the cutoff") {
    val rows = SparkEntry.queries("dedup_threshold_sweep")(spark, sf0001)
      .orderBy("t20").collect()
    assert(rows.map(_.getAs[Long]("t20")).toSeq == (10L to 19L))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    assert(pairs.sliding(2).forall(p => p(0) >= p(1)))
    assert(docs.sliding(2).forall(p => p(0) >= p(1)))
    rows.foreach(r => // a pair touches ≤2 docs
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs")))
  }
}
