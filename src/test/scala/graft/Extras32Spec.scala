package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-30 operators: effect-size recompute
  * and t-statistic consistency, ORC roundtrip fidelity.
  */
class Extras32Spec extends SparkSpec {

  test("cohen's d: recomputes from raw data; sign agrees with welch t") {
    import spark.implicits._
    val got = SparkEntry.queries("stat_cohens_d")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (n1, n2, d6) = got.head
    val raw = graft.io.Tables.customer(spark, sf0001)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment"), expr("CAST(round(c_acctbal*100) AS BIGINT)"))
      .as[(String, Long)].collect()
    val a = raw.filter(_._1 == "BUILDING").map(_._2)
    val b = raw.filter(_._1 == "MACHINERY").map(_._2)
    assert(n1 == a.length && n2 == b.length)
    def mean(xs: Array[Long]) = xs.sum.toDouble / xs.length
    def ss(xs: Array[Long]) =
      xs.map(x => BigInt(x) * x).sum.toDouble -
        xs.sum.toDouble * xs.sum / xs.length
    val pooled = math.sqrt((ss(a) + ss(b)) / (a.length + b.length - 2))
    assert(d6 == math.round((mean(a) - mean(b)) / pooled * 1e6), "d recompute")
    val t = SparkEntry.queries("stat_ttest_welch")(spark, sf0001)
      .as[(Long, Long, Long, Long)].head()._4
    assert(math.signum(d6.toDouble) == math.signum(t.toDouble),
      "effect size and t statistic agree in sign")
  }

  test("orc roundtrip preserves rows and schema") {
    val src = graft.io.Tables.customer(spark, sf0001)
    val back = SparkEntry.queries("sink_orc")(spark, sf0001)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
