package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-side invariant audit for [[Similarity.dbscanBanded]] — the
  * verification path for corpora where the DuckDB oracle is
  * infeasible (cluster_dbscan's transitive-closure CTE over the 100×
  * corpus's ~10 M-pair ε-graph): instead of a second engine, the
  * audit checks the DBSCAN axioms directly against the ε-edge
  * relation (itself cross-engine hash-verified at every decade
  * through the banded dedup family, which reads the SAME
  * [[Similarity.bandedVerifiedPairs]] relation), plus an
  * INDEPENDENTLY-CODED small-step label propagation that must agree
  * with the production pointer-jumping connected components on every
  * core assignment.
  *
  * Invariants (each a COUNT that must be zero, so a violation names
  * its class):
  *  1. core–core ε-edges never cross clusters;
  *  2. a non-core point with a core ε-neighbor is BORDER, never noise
  *     (and a point with no core neighbor is never border);
  *  3. every border point carries exactly its MINIMUM core
  *     neighbor's cluster (the order-free border rule);
  *  4. core ↔ (degree + 1 ≥ minPts), recomputed from the raw edges;
  *  5. the independent small-step propagation's component per core
  *     equals the production assignment (including singleton cores).
  */
object DbscanAudit {

  /** Small-step min-label propagation — deliberately NOT
    * [[graft.ops.Graph.connectedComponents]] (pointer jumping): a
    * from-scratch fixpoint of label(v) ← min(label(v), min over
    * neighbors) so the two implementations can only agree by both
    * being right. O(diameter) rounds; each generation checkpointed
    * (the CC loop's lineage-cut policy). */
  private[graft] def smallStepComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(edges.select(col("id_b").as("id"), col("id_a").as("nb")))
      .localCheckpoint()
    var lab = sym.select("id").distinct()
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val next = sym
        .join(lab.select(col("id").as("nb"), col("component").as("nc")), "nb")
        .groupBy("id").agg(min("nc").as("m"))
        .join(lab, "id")
        .select(col("id"), least(col("component"), col("m")).as("component"))
        .localCheckpoint()
      changed = next
        .join(lab.select(col("id"), col("component").as("old")), "id")
        .filter(col("component") =!= col("old")).count()
      lab = next
    }
    lab
  }

  /** Runs the full audit; returns the counter map (all violation
    * counters zero on success) and THROWS on any violation. */
  def audit(emb: DataFrame, num: Int = 1, den: Int = 5,
      minPts: Int = 3): Map[String, Long] = {
    val pairs = Similarity.bandedVerifiedPairs(emb, num, den)
      .localCheckpoint()
    val asg = Similarity.dbscanBanded(emb, num, den, minPts)
      .localCheckpoint()
    val a = asg.select(col("vec_id").as("id_a"), col("role").as("ra"),
      col("cluster_id").as("ca"))
    val b = asg.select(col("vec_id").as("id_b"), col("role").as("rb"),
      col("cluster_id").as("cb"))
    val e = pairs.join(a, "id_a").join(b, "id_b").localCheckpoint()

    // 1. core–core edges stay inside one cluster
    val coreCross = e.filter(col("ra") === "core" && col("rb") === "core" &&
      col("ca") =!= col("cb")).count()

    // 2. role consistency against the edge relation
    val sym = e.select(col("id_a").as("id"), col("ra").as("r"),
        col("ca").as("c"), col("id_b").as("nb"), col("rb").as("nr"),
        col("cb").as("nc"))
      .unionByName(e.select(col("id_b").as("id"), col("rb").as("r"),
        col("cb").as("c"), col("id_a").as("nb"), col("ra").as("nr"),
        col("ca").as("nc")))
    val hasCoreNbr = sym.filter(col("nr") === "core")
      .select("id").distinct()
    val noiseWithCoreNbr = asg.filter(col("role") === "noise")
      .join(hasCoreNbr, asg("vec_id") === hasCoreNbr("id"), "left_semi")
      .count()
    val borderNoCoreNbr = asg.filter(col("role") === "border")
      .join(hasCoreNbr, asg("vec_id") === hasCoreNbr("id"), "left_anti")
      .count()

    // 3. border cluster = min over core neighbors' clusters
    val wantBorder = sym.filter(col("r") =!= "core" && col("nr") === "core")
      .groupBy("id").agg(min("nc").as("want"))
    val borderWrong = asg.filter(col("role") === "border")
      .join(wantBorder, asg("vec_id") === wantBorder("id"))
      .filter(col("cluster_id") =!= col("want")).count()

    // 4. core ⇔ degree + 1 ≥ minPts, recomputed from raw edges
    val deg = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val roleWrong = asg
      .join(deg, asg("vec_id") === deg("id"), "left")
      .filter((coalesce(col("deg"), lit(0L)) + 1 >= minPts) =!=
        (col("role") === "core"))
      .count()

    // 5. independent small-step CC agrees on every core assignment
    val cores = asg.filter(col("role") === "core")
      .select(col("vec_id"), col("cluster_id"))
    val coreEdges = pairs
      .join(cores.select(col("vec_id").as("id_a")), "id_a")
      .join(cores.select(col("vec_id").as("id_b")), "id_b")
      .select("id_a", "id_b")
    val ss = smallStepComponents(coreEdges)
    val ccDisagree = cores
      .join(ss, cores("vec_id") === ss("id"), "left")
      // singleton cores (no core edge) have no propagation row and
      // must self-label
      .filter(coalesce(col("component"), cores("vec_id")) =!=
        col("cluster_id"))
      .count()

    val out = Map(
      "n_vectors" -> asg.count(),
      "n_edges" -> pairs.count(),
      "n_core" -> asg.filter(col("role") === "core").count(),
      "n_border" -> asg.filter(col("role") === "border").count(),
      "n_noise" -> asg.filter(col("role") === "noise").count(),
      "n_clusters" -> asg.filter(col("cluster_id") >= 0)
        .select("cluster_id").distinct().count(),
      "viol_core_edge_cross" -> coreCross,
      "viol_noise_with_core_nbr" -> noiseWithCoreNbr,
      "viol_border_no_core_nbr" -> borderNoCoreNbr,
      "viol_border_not_min" -> borderWrong,
      "viol_role_vs_degree" -> roleWrong,
      "viol_cc_disagree" -> ccDisagree)
    val viols = out.filter(kv => kv._1.startsWith("viol_") && kv._2 != 0L)
    require(viols.isEmpty, s"DBSCAN invariant violations: $viols ($out)")
    out
  }
}
