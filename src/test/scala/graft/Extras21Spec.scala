package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-18 operators: TTR bounds and hapax
  * logic, source-report pair conservation, gzip roundtrip fidelity.
  */
class Extras21Spec extends SparkSpec {

  test("lexical diversity: types <= tokens; hapax tokens have corpus freq 1") {
    import spark.implicits._
    val got = SparkEntry.queries("text_lexical_diversity")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, toks, types, ttr, hapax) =>
      assert(types <= toks, s"doc $id")
      assert(ttr == math.round(types.toDouble * 1e6 / toks), s"doc $id ttr")
      assert(hapax <= toks)
    }
    // corpus-level: total hapax tokens == number of corpus-frequency-1 terms
    val cf = graft.io.Tables.documents(spark, sf0001)
      .select(explode(split(lower(trim(col("text"))), " +")).as("t"))
      .groupBy("t").count()
    assert(got.map(_._5).sum == cf.filter(col("count") === 1).count())
  }

  test("source report: within-pairs + cross-pair endpoints == 2*edges; docs conserve") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_source_report")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val edges = graft.text.Dedup.nearDupPairs(
      graft.io.Tables.documents(spark, sf0001), "doc_id", "text", 0.7)
    val src = graft.io.Tables.documents(spark, sf0001)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val pairs = edges.select("id_a", "id_b").as[(Long, Long)].collect()
    val within = pairs.count(p => src(p._1) == src(p._2))
    val cross = pairs.count(p => src(p._1) != src(p._2))
    assert(got.map(_._3).sum == within, "within pairs conserve")
    assert(got.map(_._4).sum == 2L * cross, "each cross pair counted at both ends")
    assert(got.map(_._2).sum == src.size, "docs partition by source")
  }

  test("gzip csv roundtrip: files are gzip, rows and schema survive") {
    val src = graft.io.Tables.customer(spark, sf0001)
    val back = SparkEntry.queries("sink_csv_gzip")(spark, sf0001)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val out = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_sink_csv_gz_" +
      sf0001.replaceAll("[^A-Za-z0-9]", "_"))
    assert(out.listFiles().exists(_.getName.endsWith(".csv.gz")),
      "writer actually emitted gzip members")
  }
}
