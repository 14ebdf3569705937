package graft

import java.sql.Timestamp

import graft.ops.{Graph, Scd}
import org.apache.spark.sql.functions._

/** Round-3 operators: SCD-2 interval building, connected-components
  * clustering, stratified sampling determinism, profiling, compaction.
  */
class Extras3Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("buildScd2 collapses runs and closes intervals with the successor") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-01 01:00:00"), 2L),
      (1L, "b", ts("2024-01-01 02:00:00"), 3L),
      (1L, "a", ts("2024-01-01 03:00:00"), 4L), // a again → NEW version
      (2L, "x", ts("2024-01-01 00:30:00"), 5L)
    ).toDF("k", "v", "t", "id")
    val out = Scd.buildScd2(df, col("k"), col("v"), col("t"), col("id"))
      .orderBy("key", "version").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (2L, 1L, "x")))
    // v1 closes when v2 opens; the latest version per key is open
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1(0).getTimestamp(4) == k1(1).getTimestamp(3))
    assert(k1(2).isNullAt(4) && out.last.isNullAt(4))
    // run of 2 'a' events collapsed into version 1
    assert(k1(0).getLong(5) == 2L)
  }

  test("buildScd2 treats NULL attributes with IS DISTINCT FROM semantics") {
    // x → NULL opens a version; NULL → NULL does NOT (one collapsed
    // run); NULL → x opens again — mirrors the oracles' lag(attr)
    // IS DISTINCT FROM attr. The old isNull|| =!= spelling missed the
    // x→NULL boundary and split NULL runs row-by-row.
    val df = Seq(
      (1L, Some("x"), ts("2024-01-01 00:00:00"), 1L),
      (1L, None, ts("2024-01-01 01:00:00"), 2L),
      (1L, None, ts("2024-01-01 02:00:00"), 3L),
      (1L, Some("x"), ts("2024-01-01 03:00:00"), 4L)
    ).toDF("k", "v", "t", "id")
    val out = Scd.buildScd2(df, col("k"), col("v"), col("t"), col("id"))
      .orderBy("version").collect()
    assert(out.map(r => (r.getLong(1),
      if (r.isNullAt(2)) null else r.getString(2), r.getLong(5))).toSeq ==
      Seq((1L, "x", 1L), (2L, null, 2L), (3L, "x", 1L)))
  }

  test("buildScd2 breaks timestamp ties by the tie column") {
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, "b", t0, 2L), (1L, "a", t0, 1L)).toDF("k", "v", "t", "id")
    val out = Scd.buildScd2(df, col("k"), col("v"), col("t"), col("id"))
      .orderBy("version").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("a", "b"))
  }

  test("connectedComponents finds min-id components within diameter") {
    // two components: {1,2,3,4} (a chain) and {10,11}; singleton 99 absent
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val cc = Graph.connectedComponents(edges, iterations = 4)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents converges on chains far deeper than the round cap") {
    // a 60-node path: diameter 59 ≫ the default 20-round cap, so the
    // old one-hop-per-round spelling would exit the cap with a
    // SILENTLY wrong labeling. Pointer jumping covers ~2^k distance
    // in k rounds — the whole chain must collapse to component 1,
    // and well under the cap (8 rounds ≥ log2(59) with margin).
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Graph.connectedComponents(chain, iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 60 && got.values.forall(_ == 1L))
    // and one round still means one neighbor+jump pass, not a fixpoint:
    // the far end cannot have reached the minimum yet
    val one = Graph.connectedComponents(chain, iterations = 1)
      .filter(col("id") === 60L).head().getLong(1)
    assert(one != 1L)
  }

  test("dedup_clusters assigns every doc a cluster and min-id labels") {
    val out = Registry.all.find(_.name == "dedup_clusters").get
      .fn(spark, sf0001).collect()
    assert(out.length == 500)
    // labels are min ids: cluster_id <= doc_id always
    assert(out.forall(r => r.getLong(1) <= r.getLong(0)))
    // the planted near-dups produce at least one non-trivial cluster
    assert(out.count(r => r.getLong(1) != r.getLong(0)) > 0)
  }

  test("sample_stratified is deterministic and capped per stratum") {
    val q = Registry.all.find(_.name == "sample_stratified").get
    val a = q.fn(spark, sf0001).collect()
    val b = q.fn(spark, sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val perSeg = a.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(perSeg.values.forall(_ <= 50))
  }

  test("dq_profile reports exact per-column stats") {
    val rows = Registry.all.find(_.name == "dq_profile").get
      .fn(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("c_acctbal", "c_custkey", "c_mktsegment",
      "c_name", "c_nationkey"))
    val key = rows("c_custkey")
    assert(key.getLong(1) == 150L) // n_rows at sf0.001
    assert(key.getLong(2) == 0L)   // no nulls
    assert(key.getLong(3) == 150L) // all distinct
    assert(rows("c_mktsegment").getLong(3) == 5L)
  }

  test("sink_compact writes exactly 4 balanced files that roundtrip") {
    val r = Registry.all.find(_.name == "sink_compact").get
      .fn(spark, sf0001).head()
    assert(r.getLong(0) == 4L)
    val n = io.Tables.lineitem(spark, sf0001).count()
    assert(r.getLong(1) == n)
  }
}
