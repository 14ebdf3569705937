package graft

import graft.functions.Exprs
import graft.pipeline.Pipelines
import org.apache.spark.sql.functions._

/** The pandas-semantics gotchas from SURVEY.md §2.3 — each one a
  * dedicated assertion. */
class PandasParitySpec extends SparkSpec {
  import spark.implicits._

  test("NaN → \"nan\" under astype(str): missing comment has length 3 (app.py:171)") {
    val df = Seq(Some("hello"), None, Some("")).toDF("comments")
      .select(Exprs.lengthNanParity(col("comments")).as("len"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(5L, 3L, 0L))
  }

  test("dropna drops rows with ANY null, not all (etl_core.py:33)") {
    val df = Seq(
      (Some("a"), Some("b")),
      (Some("a"), None),
      (None: Option[String], None: Option[String])
    ).toDF("x", "y")
    assert(df.na.drop("any").count() == 1)
  }

  test("demo pipeline has NO dropna; clean+AI does (SURVEY §2.3.2)") {
    val df = Seq(Some("hi"), None).toDF("comments")
    assert(Pipelines.demo(df).count() == 2)          // null row kept, length 3
    assert(Pipelines.cleanAi(df).count() == 1)       // null row dropped
  }

  test("clean+AI prefers `review` over `comments` (etl_core.py:56-58)") {
    val df = Seq(("fast fast", "slow slow")).toDF("review", "comments")
    val out = Pipelines.cleanAi(df).collect().head
    assert(out.getAs[String]("sentiment_result") == "POSITIVE") // scored on review
  }

  test("schema gate fails fast when required column is missing (app.py:167-168)") {
    val df = Seq(1).toDF("unrelated")
    intercept[IllegalArgumentException] {
      ops.Relational.chooseTextColumn(df, Seq("review", "comments"))
    }
  }

  test("etl flags: clean=false keeps nulls, ai=false adds no sentiment") {
    val df = Seq(Some("x"), None).toDF("comments")
    val out = Pipelines.cleanAi(df, Pipelines.EtlOptions(clean = false, ai = true))
    assert(out.count() == 2)
    val off = Pipelines.cleanAi(df, Pipelines.EtlOptions(clean = false, ai = false))
    assert(!off.columns.contains("sentiment_result"))
  }

  test("password hash: verify accepts correct, rejects wrong (app.py:88,102)") {
    val df = Seq(("alice", "s3cret")).toDF("user", "pw")
      .withColumn("stored", Exprs.hashPassword(col("pw"), col("user")))
      .select(
        Exprs.checkPassword(col("pw"), col("user"), col("stored")).as("ok"),
        Exprs.checkPassword(lit("wrong"), col("user"), col("stored")).as("bad"))
    val r = df.collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
