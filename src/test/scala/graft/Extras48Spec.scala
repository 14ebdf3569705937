package graft

import org.apache.spark.sql.functions._

/** Wave-48: LSH S-curve audit, label-blocked exact kNN graph,
  * curriculum bucketing. */
class Extras48Spec extends SparkSpec {

  test("lsh s-curve: verified pairs are near-certain candidates at (16,4)") {
    val df = SparkEntry.queries("dedup_lsh_scurve")(spark, sf0001).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val j6 = r.getAs[Long]("j6")
      val p6 = r.getAs[Long]("p_catch_e6")
      assert(j6 >= 700000L) // pairs enter at Jaccard ≥ 0.7
      // S(0.7) = 1 − (1 − 0.7⁴)¹⁶ ≈ 0.98766 — the analytic floor
      assert(p6 >= 987000L && p6 <= 1000000L)
    }
  }

  test("knn graph: ≤3 neighbors per vector, same label, ranks dense") {
    val g = SparkEntry.queries("sim_knn_graph")(spark, sf0001)
    val emb = graft.io.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
    val byVec = g.groupBy("vec_id").agg(count(lit(1)).as("n"),
      max("rn").as("maxrn")).collect()
    byVec.foreach { r =>
      assert(r.getAs[Long]("n") <= 3)
      assert(r.getAs[Long]("maxrn") == r.getAs[Long]("n")) // 1..n dense
    }
    // every edge stays inside its label block
    val crossLabel = g
      .join(emb.withColumnRenamed("vec_id", "v").withColumnRenamed("label", "la"),
        col("vec_id") === col("v"))
      .join(emb.withColumnRenamed("vec_id", "w").withColumnRenamed("label", "lb"),
        col("nb_id") === col("w"))
      .filter(col("la") =!= col("lb")).count()
    assert(crossLabel == 0)
  }

  test("curriculum: 4 near-equal phases, difficulty monotone in phase") {
    val c = SparkEntry.queries("corpus_curriculum")(spark, sf0001)
    val sizes = c.groupBy("phase").agg(count(lit(1)).as("n"),
        avg("n_tok").as("avg_tok"))
      .orderBy("phase").collect()
    assert(sizes.map(_.getAs[Long]("phase")).toSeq == Seq(1L, 2L, 3L, 4L))
    val ns = sizes.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1) // exact ntile equal-count contract
    val avgs = sizes.map(_.getAs[Double]("avg_tok"))
    assert(avgs.sliding(2).forall(p => p(0) <= p(1)))
  }
}
