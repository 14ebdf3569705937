package graft

import graft.plans.GraftFunctions
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Native SimHash64 expression vs the UDF-over-token-array formulation
  * it replaced — must be bit-identical (same MurmurHash3 family, same
  * tokenization as the minhash kernel). */
class SimHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val legacyUdf = udf((toks: Seq[String]) => Dedup.simhash64(toks))

  test("native simhash64 == UDF-over-tokensCol on real documents") {
    GraftFunctions.register(spark)
    val docs = io.Tables.documents(spark, sf0001).limit(200)
    val rows = docs.select(
      call_function("simhash64", col("text")).as("native"),
      legacyUdf(Dedup.tokensCol(col("text"))).as("legacy"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("degenerate inputs match (blank, single token, repeated spaces)") {
    GraftFunctions.register(spark)
    val rows = Seq("", "   ", "single", "  spaced   out  ", "a a a b")
      .toDF("text")
      .select(call_function("simhash64", col("text")).as("native"),
        legacyUdf(Dedup.tokensCol(col("text"))).as("legacy"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("occurrence sensitivity preserved (not distinct-token)") {
    // 'a a a b' must differ from 'a b' — each occurrence votes
    assert(Dedup.simhash64(Seq("a", "a", "a", "b")) !=
      Dedup.simhash64(Seq("a", "b")))
  }

  test("two simhash64 calls in ONE projection survive codegen (fallback disabled)") {
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = io.Tables.documents(spark, sf0001).limit(50)
        .select(call_function("simhash64", col("text")).as("s1"),
          call_function("simhash64", upper(col("text"))).as("s2"))
        .collect()
      assert(rows.nonEmpty)
      // tokenization lowercases, so the upper()'d twin must agree
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
