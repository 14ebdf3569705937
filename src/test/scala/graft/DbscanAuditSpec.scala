package graft

import graft.sim.DbscanAudit
import org.apache.spark.sql.functions._

class DbscanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("small-step propagation labels components by minimum id " +
      "(independent of the production pointer-jumping CC)") {
    // two components {1,2,3} and {10,11}, plus 3 reachable via 2
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = DbscanAudit.smallStepComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // agreement with the production implementation on the same graph
    val prod = graft.ops.Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prod == got)
  }

  test("full invariant audit passes on the sf0.001 corpus (the same " +
      "audit the 100x verification runs — SERIAL.md VERIFY_100x_dbscan)") {
    val out = DbscanAudit.audit(io.Tables.embeddings(spark, sf0001))
    assert(out("n_vectors") > 0)
    assert(out.filter(_._1.startsWith("viol_")).values.forall(_ == 0L))
    // non-degenerate fixture: all three roles and at least one cluster
    assert(out("n_core") > 0 && out("n_noise") > 0 && out("n_clusters") > 0)
  }

  test("audit counters match a hand-built corpus with exactly-known " +
      "roles: a 4-core clique in one cluster plus one noise vector") {
    // hand-built corpus: a tight 4-clique around one direction and an
    // isolated opposite vector → 4 cores in one cluster + 1 noise
    def v(first: Float, eps: Float) =
      (0 until 64).map(j => if (j == 0) first else eps).toArray
    val emb = Seq(
      (1L, v(1.0f, 0.01f)), (2L, v(1.001f, 0.01f)),
      (3L, v(0.999f, 0.01f)), (4L, v(1.002f, 0.01f)),
      (5L, v(-1.0f, -0.01f))).toDF("vec_id", "embedding")
    val out = DbscanAudit.audit(emb, 1, 5, 3)
    assert(out("n_core") == 4L && out("n_noise") == 1L)
    assert(out("n_clusters") == 1L)
  }
}
