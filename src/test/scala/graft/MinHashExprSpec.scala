package graft

import graft.plans.GraftFunctions
import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Native MinHashSignature expression vs the declarative
  * shingle→hash→min formulation — bit-identical signatures. */
class MinHashExprSpec extends SparkSpec {

  test("native minhash_signature == declarative signatureCol") {
    GraftFunctions.register(spark)
    val docs = io.Tables.documents(spark, sf0001).limit(200)
    val both = docs.select(
      Dedup.signatureCol(col("text")).as("decl"),
      call_function("minhash_signature", col("text")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("native shingles == declarative shinglesCol") {
    GraftFunctions.register(spark)
    val docs = io.Tables.documents(spark, sf0001).limit(100)
    docs.select(Dedup.shinglesCol(col("text")).as("decl"),
      call_function("shingles", col("text")).as("native"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("short and degenerate docs") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("one two", "single", "  spaced   out  ", "a b c")
      .toDF("text")
      .select(Dedup.signatureCol(col("text")).as("decl"),
        call_function("minhash_signature", col("text")).as("native"))
    df.collect().foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
