package graft

import org.apache.spark.sql.functions._

/** The memory-safe bucket-list aggregate backing the LSH and
  * inverted-index dedup paths (plans/CappedCollectLongs). */
class CappedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("exact below the cap, truncated-to-cap+1 above — across partitions") {
    graft.plans.GraftFunctions.register(spark)
    // group A: 5 ids (≤ cap) — exact, complete list
    // group B: 40 ids (> cap) — must surface as size cap+1, content moot
    val df = ((1 to 5).map(i => ("a", i.toLong)) ++
      (1 to 40).map(i => ("b", 100L + i))).toDF("g", "id")
      .repartition(8) // force partial aggregation + merges
    val out = df.groupBy("g")
      .agg(call_function("capped_collect_longs", col("id"), lit(10)).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a").sorted == (1L to 5L))
    assert(out("b").length == 11) // cap+1 — the overflow marker
    assert(out("b").toSet.subsetOf((101L to 140L).toSet))
  }

  test("candidatePairs with capped aggregate == collect_list spelling") {
    // 30 docs: one 12-member exact-dup clique (bucket size 12 > cap 10
    // → dropped by the guard), plus 3 near-dup pairs that must survive.
    val docs = ((1 to 12).map(i =>
        (i.toLong, "all these documents carry the very same duplicated text payload")) ++
      Seq(
        (20L, "spark shuffles data between executors during wide transformations"),
        (21L, "spark shuffles data between executors during wide transformation"),
        (30L, "completely different content about databases and storage formats"),
        (31L, "completely different content about databases and storage format"))
      ).toDF("doc_id", "text")
    val got = graft.text.Dedup.candidatePairs(docs, "doc_id", "text", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the uncapped spelling with the same post-filter
    graft.plans.GraftFunctions.register(spark)
    val ref = graft.text.Dedup.withSignature(docs, "doc_id", "text")
      .select(col("id"), explode(graft.text.Dedup.bandsCol(col("mh_sig"))).as("bk"))
      .groupBy("bk").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, 10))
      .select(explode(expr(
        "flatten(transform(array_sort(array_distinct(ids)), (x, i) -> " +
          "transform(slice(array_sort(array_distinct(ids)), i + 2, size(ids)), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      .select(col("p.a"), col("p.b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref)
    // the clique is gone (guard), the near-dup pairs are present
    assert(!got.exists { case (a, b) => a <= 12 && b <= 12 })
    assert(got.contains((20L, 21L)) && got.contains((30L, 31L)))
  }
}
