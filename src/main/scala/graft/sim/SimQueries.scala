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

    // id-level oracle for the brute-force top-k: the cosine VALUES may
    // differ from DuckDB's in the last ulps (different accumulators),
    // but the induced ORDER of distinct random vectors is identical —
    // ties between different vectors are measure-zero.
    Q("sim_topk_ids",
      Some("""WITH q AS (SELECT embedding AS qe, vec_id AS qid
             |           FROM embeddings ORDER BY vec_id LIMIT 1)
             |SELECT e.vec_id, e.label FROM embeddings e, q
             |WHERE e.vec_id <> q.qid
             |ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
             |                                CAST(q.qe AS DOUBLE[])) DESC, e.vec_id
             |LIMIT 10""".stripMargin),
      (s, d) => Similarity.bruteForceTopK(embeddings(s, d), 10)
        .select("vec_id", "label")),

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
