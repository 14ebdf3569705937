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

  test("two instances of each kernel expression in ONE projection survive codegen (fallback disabled)") {
    // the defect class CosineSimilarity had (hardcoded generated-Java
    // locals colliding when one function holds the expression twice)
    // cannot occur here — both kernels codegen to a single static call
    // with no locals — but the pin is the same: fallback=false turns
    // any future silent interpreted downgrade into a hard failure.
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = io.Tables.documents(spark, sf0001).limit(50)
      val rows = docs.select(
        call_function("minhash_signature", col("text")).as("s1"),
        call_function("minhash_signature", upper(col("text"))).as("s2"),
        call_function("shingles", col("text")).as("g1"),
        call_function("shingles", upper(col("text"))).as("g2"))
        .collect()
      assert(rows.nonEmpty)
      // tokenization lowercases, so the upper()'d twin must agree
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
        assert(r.getSeq[String](2) == r.getSeq[String](3))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
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
