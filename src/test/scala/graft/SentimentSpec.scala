package graft

import graft.text.Sentiment
import org.apache.spark.sql.functions._

/** Reference-parity semantics for the sentiment operator
  * (SURVEY.md §2.3.3-4: blank→NEUTRAL, 4900-char truncation, ERROR
  * sentinel, label totality). */
class SentimentSpec extends SparkSpec {
  import spark.implicits._

  test("blank and null → NEUTRAL (etl_core.py:38-39)") {
    val df = Seq("", "   ", null, "\t ").toDF("t")
      .select(Sentiment.sentimentCol(col("t")).as("s"))
    assert(df.collect().forall(_.getString(0) == "NEUTRAL"))
  }

  test("lexicon labels: positive / negative / mixed") {
    val df = Seq(
      "this is fast and clean",       // 2 pos, 0 neg
      "so slow and the worst dup",    // 0 pos, 3 neg
      "fast but slow",                // 1 pos, 1 neg -> MIXED
      "nothing matching here"         // 0 / 0 -> NEUTRAL
    ).toDF("t").select(Sentiment.sentimentCol(col("t")).as("s"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("POSITIVE", "NEGATIVE", "MIXED", "NEUTRAL"))
  }

  test("input truncated to 4900 chars (etl_core.py:43)") {
    // 'fast' appears only beyond 4900 chars → must be ignored
    val long = ("x" * 4900) + " fast fast fast"
    val df = Seq(long).toDF("t").select(Sentiment.sentimentCol(col("t")).as("s"))
    assert(df.collect().head.getString(0) == "NEUTRAL")
    // and the scala scorer agrees
    assert(Sentiment.score(long) == "NEUTRAL")
  }

  test("column scorer == scala scorer on testdata") {
    val docs = io.Tables.documents(spark, sf0001)
    val got = docs.select(col("text"), Sentiment.sentimentCol(col("text")).as("s"))
      .collect()
    got.foreach(r => assert(r.getString(1) == Sentiment.score(r.getString(0))))
  }

  test("batched enrichment matches per-row scoring; ERROR sentinel on client failure") {
    val docs = io.Tables.documents(spark, sf0001).limit(50)
    val ok = Sentiment.enrichBatched(docs, "text", "sentiment_result")
    ok.collect().foreach { r =>
      assert(r.getAs[String]("sentiment_result") ==
        Sentiment.score(r.getAs[String]("text")))
    }
    val failing = new Sentiment.SentimentClient {
      def detectBatch(texts: Seq[String]): Seq[String] =
        throw new RuntimeException("simulated outage")
    }
    val err = Sentiment.enrichBatched(docs, "text", "sentiment_result", failing)
    assert(err.collect().forall(_.getAs[String]("sentiment_result") == "ERROR"))
  }

  test("property: scorer is total over the 5-label set (seeded fuzz)") {
    val prop = org.scalacheck.Prop.forAll(org.scalacheck.Gen.asciiPrintableStr) {
      s: String =>
        Set("POSITIVE", "NEGATIVE", "NEUTRAL", "MIXED", "ERROR")(Sentiment.score(s))
    }
    assert(org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
