package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-24 operators: replacement mapping
  * totality, weighted-sample determinism and weight bias.
  */
class Extras26Spec extends SparkSpec {

  test("replace: mapped values gone, unmapped untouched, row count stable") {
    import spark.implicits._
    val got = SparkEntry.queries("replace_funcs")(spark, sf0001)
      .as[(Long, String, Int)].collect()
    val src = graft.io.Tables.customer(spark, sf0001)
    assert(got.length == src.count())
    assert(!got.exists(r => r._2 == "AUTOMOBILE" || r._2 == "MACHINERY"))
    assert(got.exists(_._2 == "AUTO") && got.exists(_._2 == "MACH"))
    assert(!got.exists(_._3 == 0) && got.exists(_._3 == 99))
  }

  test("weighted sample: deterministic across runs; overweights big orders") {
    import spark.implicits._
    val s1 = SparkEntry.queries("sample_weighted")(spark, sf0001)
      .as[(Long, Long)].collect()
    val s2 = SparkEntry.queries("sample_weighted")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(s1.toSeq == s2.toSeq, "same sample every run")
    assert(s1.length == 50 && s1.map(_._1).distinct.length == 50)
    // weight bias: the sampled mean weight exceeds the population mean
    val popMean = graft.io.Tables.orders(spark, sf0001)
      .agg(avg(expr("CAST(round(o_totalprice*100) AS BIGINT)")))
      .head().getDouble(0)
    val sampleMean = s1.map(_._2).sum.toDouble / s1.length
    assert(sampleMean > popMean, "weighted sampling favors heavy rows")
  }
}
