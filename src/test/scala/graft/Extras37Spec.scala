package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-35 operators. */
class Extras37Spec extends SparkSpec {

  test("novelty: doc 0 is fully novel; shares bounded; novel totals = vocab size") {
    import spark.implicits._
    val got = SparkEntry.queries("text_novelty")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val first = got.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1000000L,
      "the earliest document owns all its shingles")
    got.foreach { case (id, n, novel, e6) =>
      assert(novel <= n, s"doc $id")
      assert(e6 == math.round(novel.toDouble * 1e6 / n), s"doc $id share")
    }
    // every distinct shingle is novel in exactly one doc
    graft.plans.GraftFunctions.register(spark)
    val vocab = graft.io.Tables.documents(spark, sf0001)
      .select(explode(array_distinct(call_function("shingles", col("text")))))
      .distinct().count()
    assert(got.map(_._3).sum == vocab, "novel counts partition the shingle vocab")
  }

  test("wilson ci: lo <= p_hat <= hi; interval inside [0, 1e6]") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_wilson_ci")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (pri, n, x, lo, hi) =>
      val p6 = x.toDouble * 1e6 / n
      assert(lo <= p6 + 1 && p6 <= hi + 1, s"$pri brackets p-hat")
      assert(lo >= 0 && hi <= 1000000L && lo < hi, s"$pri bounds")
    }
  }
}
