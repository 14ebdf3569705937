package graft.sim

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Registered similarity-search queries over `embeddings`. Cosine values
  * depend on float-accumulation order only on the DuckDB side (ours is a
  * fixed-order double fold), so these are rows-only checks; exactness is
  * covered by unit tests against a hand-computed reference.
  */
object SimQueries {

  def queries: Seq[Q] = Seq(
    // brute-force cosine top-10 vs the lowest-id query vector.
    Q("sim_topk_brute",
      None,
      (s, d) => Similarity.bruteForceTopK(embeddings(s, d), 10)),

    // per-label top-3 (window row_number inside each label).
    Q("sim_topk_per_label",
      None,
      (s, d) => Similarity.perLabelTopK(embeddings(s, d), 3)
        .orderBy("label", "rn")),

    // IVF: probe the 2 nearest label-centroid cells, scan only those.
    Q("sim_topk_ivf",
      None,
      (s, d) => Similarity.ivfTopK(embeddings(s, d), 10, 2)),

    // embedding-cosine near-dedup → kept corpus (sign-LSH buckets).
    Q("dedup_embedding",
      None,
      (s, d) => Similarity.dedupEmbeddings(embeddings(s, d), 0.95)
        .select("vec_id").orderBy("vec_id"))
  )
}
