package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native DotLongs / L2SqLongs kernels vs the declarative zip_with/
  * aggregate folds they replaced (r16) — must be bit-identical,
  * including 64-bit wrap behavior and the null contracts. */
class DotLongsExprSpec extends SparkSpec {
  import spark.implicits._

  private def quant = transform(col("embedding"),
    x => round(x.cast("double") * 1e6).cast("long"))

  test("dot_longs and l2sq_longs match the declarative folds on real " +
    "embeddings under codegen (fallback disabled)") {
    GraftFunctions.register(spark)
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = io.Tables.embeddings(spark, sf0001)
      val q = broadcast(emb.orderBy("vec_id").limit(1)
        .select(quant.as("qb")))
      val rows = emb.select(col("vec_id"), quant.as("qa")).crossJoin(q)
        .select(
          call_function("dot_longs", col("qa"), col("qb")).as("dot_n"),
          aggregate(zip_with(col("qa"), col("qb"), (a, b) => a * b),
            lit(0L), (s, v) => s + v).as("dot_d"),
          call_function("dot_longs", col("qa"), col("qa")).as("na_n"),
          aggregate(transform(col("qa"), a => a * a),
            lit(0L), (s, v) => s + v).as("na_d"),
          call_function("l2sq_longs", col("qa"), col("qb")).as("d2_n"),
          aggregate(zip_with(col("qa"), col("qb"), (a, b) => (a - b) * (a - b)),
            lit(0L), (s, v) => s + v).as("d2_d"))
        .collect()
      assert(rows.length > 0)
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1), "dot mismatch")
        assert(r.getLong(2) == r.getLong(3), "norm mismatch")
        assert(r.getLong(4) == r.getLong(5), "l2sq mismatch")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("64-bit overflow throws, matching the ANSI declarative fold") {
    GraftFunctions.register(spark)
    val big = Seq((Array(Long.MaxValue / 2, Long.MaxValue / 2, 7L),
        Array(3L, 3L, -5L)))
      .toDF("a", "b")
    // the declarative zip_with product overflows → ANSI throws; the
    // native kernel must fail the same way, never silently wrap
    intercept[Exception] {
      big.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (s, v) => s + v).as("d")).collect()
    }
    Seq("dot_longs", "l2sq_longs").foreach { fn =>
      intercept[Exception] {
        big.select(call_function(fn, col("a"), col("b")).as("n")).collect()
      }
    }
  }

  test("null contracts: null array, null element, unequal lengths → null " +
    "(zip_with null-padding parity)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (None: Option[Array[Long]], Some(Array(1L, 2L))),
      (Some(Array(1L, 2L, 3L)), Some(Array(1L, 2L))) // unequal → zip pads null
    ).toDF("a", "b")
    Seq("dot_longs", "l2sq_longs").foreach { fn =>
      val got = df.select(call_function(fn, col("a"), col("b")).as("v")).collect()
      assert(got.forall(_.isNullAt(0)), s"$fn null contract")
    }
    // element-level null propagates like the declarative product fold
    val withNullElem = spark.sql(
      "SELECT dot_longs(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS v")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("empty arrays fold to 0, matching aggregate's zero seed") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT dot_longs(CAST(array() AS ARRAY<BIGINT>),
        |                 CAST(array() AS ARRAY<BIGINT>)) AS d,
        |       l2sq_longs(CAST(array() AS ARRAY<BIGINT>),
        |                  CAST(array() AS ARRAY<BIGINT>)) AS l""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }
}
