package graft

import graft.sim.Pq
import org.apache.spark.sql.functions._

/** Product-quantization structure + determinism. Exactness vs the
  * relational spelling is the DuckDB oracle's job (sim_topk_pq /
  * sim_pq_distortion); here we pin the shape invariants and the
  * partitioning-independence the integer arithmetic promises. */
class PqSpec extends SparkSpec {

  private def emb = graft.io.Tables.embeddings(spark, sf0001)

  test("every vector encodes to M codes, each within [0, K)") {
    val (_, codes) = Pq.codebookAndCodes(emb)
    val n = emb.count()
    assert(codes.count() == n * Pq.M)
    val perVec = codes.groupBy("vec_id").count()
      .filter(col("count") =!= Pq.M).count()
    assert(perVec == 0)
    assert(codes.filter(col("code") < 0 || col("code") >= Pq.K).count() == 0)
    assert(codes.filter(col("d2") < 0).count() == 0)
  }

  test("codebook holds at most M*K*Dsub rows, exact-grid longs") {
    val (cent, _) = Pq.codebookAndCodes(emb)
    assert(cent.count() <= Pq.M.toLong * Pq.K * Pq.Dsub)
    // grid coordinates are shifted positive and bounded by the grid
    assert(cent.filter(col("cv") < 0 || col("cv") > 20000000L).count() == 0)
  }

  test("ADC top-k: k rows, dense ranks, nondecreasing distance, query excluded") {
    val rows = Pq.topK(emb, 10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    val d = rows.map(_.getAs[Long]("approx_d2"))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    val qid = emb.orderBy("vec_id").limit(1).collect().head.getAs[Long]("vec_id")
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(qid))
  }

  test("distortion report: one row per subspace, counts = corpus size") {
    val rows = Pq.distortion(emb).collect()
    assert(rows.map(_.getAs[Long]("sub")).toSeq == (0L until Pq.M).toSeq)
    val n = emb.count()
    assert(rows.forall(_.getAs[Long]("n") == n))
    assert(rows.forall(_.getAs[Long]("avg_d2") >= 0))
  }

  test("IVF-PQ is PQ restricted to the probed cells") {
    // every IVF-PQ hit must carry the SAME approximate distance the
    // flat ADC scan assigns it, and the candidate restriction can only
    // drop results, never change a surviving distance
    val flat = Pq.topK(emb, emb.count().toInt).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("approx_d2")).toMap
    val ivf = Pq.topKIvfPq(emb, 10, 5, 2).collect()
    assert(ivf.length == 10)
    assert(ivf.forall(r =>
      flat(r.getAs[Long]("vec_id")) == r.getAs[Long]("approx_d2")))
    assert(ivf.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
  }

  test("bit-identical across partitionings (integer arithmetic is order-free)") {
    // a different input partitioning produces a different plan → memo
    // miss → full recompute; the exact-integer contract says the
    // result must not move by a single unit
    val a = Pq.topK(emb, 10).collect().map(_.toSeq).toSeq
    val b = Pq.topK(emb.repartition(7), 10).collect().map(_.toSeq).toSeq
    assert(a == b)
    val da = Pq.distortion(emb).collect().map(_.toSeq).toSeq
    val db = Pq.distortion(emb.repartition(13)).collect().map(_.toSeq).toSeq
    assert(da == db)
  }
}
