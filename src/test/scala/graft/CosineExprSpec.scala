package graft

import graft.plans.GraftFunctions
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression vs the declarative zip_with/
  * aggregate formulation — must be bit-identical (same left-to-right
  * double accumulation). */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim is bit-identical to the declarative kernel") {
    GraftFunctions.register(spark)
    val emb = io.Tables.embeddings(spark, sf0001)
    val q = Similarity.queryVector(emb)
    val both = emb.crossJoin(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("q_emb")).as("decl"),
        GraftFunctions.cosineSim(col("embedding"), col("q_emb")).as("native"))
      .collect()
    assert(both.length > 0)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("two cosine_sim calls in ONE projection survive codegen " +
    "(fallback disabled) and stay bit-identical to the declarative kernel") {
    GraftFunctions.register(spark)
    // Pre-freshName, the generated Java hardcoded locals (i, n, dot…),
    // so a function containing the expression twice failed Janino
    // compilation and SILENTLY fell back to interpreted eval — meaning
    // the bit-equality pin above never actually exercised codegen.
    // fallback=false turns that silent downgrade into a hard failure,
    // so this test proves the codegen path compiles AND matches.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = io.Tables.embeddings(spark, sf0001)
      val q = Similarity.queryVector(emb)
      val rows = emb.crossJoin(broadcast(q))
        .select(
          GraftFunctions.cosineSim(col("embedding"), col("q_emb")).as("c1"),
          GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("c2"),
          Similarity.cosine(col("embedding"), col("q_emb")).as("decl"))
        .collect()
      assert(rows.length > 0)
      rows.foreach { r =>
        val c1 = java.lang.Double.doubleToLongBits(r.getDouble(0))
        val c2 = java.lang.Double.doubleToLongBits(r.getDouble(1))
        val d = java.lang.Double.doubleToLongBits(r.getDouble(2))
        assert(c1 == d && c2 == d)
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("null and zero-norm contracts") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(0.0f, 0.0f))), // zero norm → null
      (None: Option[Array[Float]], Some(Array(1.0f, 1.0f))) // null in → null out
    ).toDF("a", "b")
      .select(GraftFunctions.cosineSim(col("a"), col("b")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("sql surface: cosine_sim callable from spark.sql") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
}
