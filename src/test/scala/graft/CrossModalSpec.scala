package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-20 operators: cross-modal agreement
  * consistency with the standalone modalities, recall bounds.
  */
class CrossModalSpec extends SparkSpec {

  test("cross-modal rows are exactly the verified text pairs; both verdicts occur") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_cross_modal")(spark, sf0001)
      .as[(Long, Long, Long, Boolean)].collect()
    val pairs = graft.text.Dedup.nearDupPairs(
        graft.io.Tables.documents(spark, sf0001), "doc_id", "text", 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)).toSet == pairs)
    assert(got.forall(_._3 >= 700000L), "jaccard threshold respected (µ-int)")
    assert(got.exists(_._4) && got.exists(!_._4),
      "agree and disagree paths both fire on this corpus")
  }

  test("recall report: 0 <= overlap <= k; recall is overlap/k exactly") {
    import spark.implicits._
    val got = SparkEntry.queries("sim_recall_report")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    val (k, common, recall) = got.head
    assert(k == 10 && common >= 0 && common <= k)
    assert(recall == common * 100000)
  }
}
