package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph ops for the dedup pipeline: near-duplicate
  * pairs are edges; the duplicate GROUPS a training-data pipeline
  * actually wants (pick one survivor per group, count group sizes) are
  * the connected components of that graph.
  */
object Graph {

  /** Connected components by iterative min-label propagation: every
    * node starts labeled with its own id; each round replaces a node's
    * label with the minimum over itself and its neighbors. After k
    * rounds every node within graph distance k of its component's
    * minimum carries that minimum — `iterations` therefore only needs
    * to cover the component DIAMETER (near-dup clusters are near-clique
    * bundles of a handful of documents, so small k converges; the
    * O(log n) alternating large-star/small-star variant is the path for
    * adversarial long-chain graphs).
    *
    * Each round is one aggregation on `dst` plus a broadcast-or-shuffle
    * join back to the labels — no driver-side state, no collect; edges
    * are reused across rounds so Spark caches the exchange.
    *
    * @param edges two-column DataFrame (src, dst), undirected pairs
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, iterations: Int = 6): DataFrame = {
    val cols = edges.columns
    val e = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    // Truncate lineage with localCheckpoint on the edge list and every
    // label generation. Iterative DataFrames are the one place lazy
    // evaluation bites: labels(i) references labels(i-1) twice
    // (directly and through the neighbor aggregate), so the LOGICAL
    // plan doubles per round — caching alone still leaves Catalyst
    // re-analyzing a 2^k tree (measured: ~12s/iteration of pure
    // analysis). localCheckpoint materializes the rows AND cuts the
    // plan to the stored blocks; a durable `checkpoint` (HDFS) is the
    // cluster-grade variant (GraphX does the same periodically).
    val bi = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    val nodes = bi.select(col("src").as("id")).distinct()
    var labels = nodes.withColumn("component", col("id")).localCheckpoint()
    // `iterations` is a CAP, not a count: label propagation reaches its
    // fixed point after diameter rounds, and every further round is a
    // full wasted pass. The `changed` flag rides the checkpointed rows,
    // so the convergence probe is a filter over materialized blocks
    // (first-match short-circuit), not a recompute.
    var converged = false
    var round = 0
    while (round < iterations && !converged) {
      val nbrMin = bi.join(labels, bi("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("component")).as("nbr_min"))
      labels = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), labels("component").as("old"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .select(col("id"), col("component"),
          (col("component") =!= col("old")).as("changed"))
        .localCheckpoint()
      converged = labels.filter(col("changed")).isEmpty
      round += 1
    }
    labels.select(col("id"), col("component"))
  }
}
