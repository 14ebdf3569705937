package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 wave-48 operators: LSH parameter tuning, the exact kNN
  * graph, and curriculum bucketing.
  */
object Extras48 {

  def queries: Seq[Q] = Seq(
    // LSH S-curve audit: for every verified near-dup pair, the
    // probability the library's banded MinHash (16 bands × 4 rows,
    // Dedup.RowsPerBand) would surface it as a candidate —
    // P = 1 − (1 − s⁴)¹⁶ — next to its exact Jaccard. The
    // threshold-tuning view an engineer reads before changing (b, r):
    // any pair with p_catch_e6 noticeably below 1e6 is recall the
    // bucket join is gambling on. Powers are spelled as explicit
    // squarings ((s·s)·(s·s), then four doublings) — identical IEEE
    // multiply chains in both engines, so the µ-ints hash-match;
    // rides the memoized verified-pair stream (one more projection,
    // zero new shuffles).
    Q("dedup_lsh_scurve",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |j AS (SELECT ia, ib,
             |        CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) AS s
             |      FROM pairs
             |      JOIN sizes sa ON sa.doc_id = pairs.ia
             |      JOIN sizes sb ON sb.doc_id = pairs.ib
             |      WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7),
             |k AS (SELECT ia, ib, s, 1 - (s * s) * (s * s) AS u FROM j),
             |k2 AS (SELECT ia, ib, s, (u * u) * (u * u) AS u4 FROM k),
             |k3 AS (SELECT ia, ib, s, (u4 * u4) * (u4 * u4) AS u16 FROM k2)
             |SELECT CAST(ia AS BIGINT) AS id_a, CAST(ib AS BIGINT) AS id_b,
             |       CAST(round(s * 1e6) AS BIGINT) AS j6,
             |       CAST(round((1 - u16) * 1e6) AS BIGINT) AS p_catch_e6
             |FROM k3 ORDER BY id_a, id_b""".stripMargin),
      (s, d) => graft.text.Dedup
        .nearDupPairs(Tables.documents(s, d), "doc_id", "text", 0.7)
        .withColumn("u", expr("1 - (jaccard * jaccard) * (jaccard * jaccard)"))
        .withColumn("u4", expr("(u * u) * (u * u)"))
        .withColumn("u16", expr("(u4 * u4) * (u4 * u4)"))
        .select(col("id_a"), col("id_b"),
          expr("CAST(round(jaccard * 1e6) AS BIGINT)").as("j6"),
          expr("CAST(round((1 - u16) * 1e6) AS BIGINT)").as("p_catch_e6"))
        .orderBy("id_a", "id_b")),

    // exact kNN graph, blocked by label (the IVF cell): each vector's
    // 3 nearest same-label neighbors by quantized cosine. The
    // all-pairs product stays INSIDE cells (|cell|² work, never corpus²
    // — the blocking every production kNN-graph build uses), and the
    // per-vector rank window partitions on vec_id. Exactness: dims
    // quantize to BIGINTs at 2¹⁴, dot/norms are exact integer sums
    // (order-free), and the single cosine division+sqrt+µ-round is a
    // correctly-rounded IEEE chain on identical inputs — both engines
    // produce the same cos_e6, so ranks can't drift on ties.
    Q("sim_knn_graph",
      Some("""WITH qv AS (SELECT vec_id, label,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(round(x * 16384) AS BIGINT)) AS q
             |       FROM embeddings),
             |n AS (SELECT vec_id, label, q,
             |        CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2
             |      FROM qv WHERE list_sum(list_transform(q, x -> x * x)) > 0),
             |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |        CAST(list_sum(list_transform(range(len(a.q)),
             |               i -> a.q[i + 1] * b.q[i + 1])) AS BIGINT) AS dot,
             |        a.n2 AS na2, b.n2 AS nb2
             |      FROM n a JOIN n b
             |        ON a.label = b.label AND a.vec_id <> b.vec_id),
             |c AS (SELECT ia, ib,
             |        CAST(round(CAST(dot AS DOUBLE)
             |             / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
             |             * 1e6) AS BIGINT) AS cos_e6
             |      FROM p)
             |SELECT ia AS vec_id, CAST(rn AS BIGINT) AS rn, ib AS nb_id, cos_e6
             |FROM (SELECT ia, ib, cos_e6,
             |        row_number() OVER (PARTITION BY ia
             |                           ORDER BY cos_e6 DESC, ib) AS rn
             |      FROM c) t
             |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin),
      (s, d) => {
        val qv = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 16384) AS BIGINT))")
            .as("q"))
        // zero-norm vectors (all dims below the quantization grid)
        // have an undefined cosine — excluded in BOTH engines (their
        // NaN would cast to 0 in Spark but NULL in DuckDB, and the two
        // sort differently under the rank window)
        val n = qv.withColumn("n2",
          expr("aggregate(transform(q, x -> x * x), 0L, (acc, x) -> acc + x)"))
          .filter(col("n2") > 0)
        val p = n.as("a").join(n.as("b"),
            col("a.label") === col("b.label") &&
              col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
            expr("aggregate(zip_with(a.q, b.q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
              .as("dot"),
            col("a.n2").as("na2"), col("b.n2").as("nb2"))
        val w = Window.partitionBy("ia").orderBy(col("cos_e6").desc, col("ib"))
        p.withColumn("cos_e6",
            expr("""CAST(round(CAST(dot AS DOUBLE)
                   | / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
                   | * 1e6) AS BIGINT)""".stripMargin))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("ia").as("vec_id"), col("rn"), col("ib").as("nb_id"),
            col("cos_e6"))
          .orderBy("vec_id", "rn")
      }),

    // curriculum bucketing: documents split into 4 exact quartile
    // phases by token count (short/easy first — the pretraining
    // curriculum ordering), assigned via ScaleRank's two-phase exact
    // ntile — the same equal-count semantics as the oracle's global
    // ntile(4) with no single-partition sort, demonstrating the helper
    // composes onto the text tables too.
    Q("corpus_curriculum",
      Some("""WITH t AS (SELECT doc_id,
             |        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |             ELSE len(string_split_regex(trim(text), ' +'))
             |             END AS BIGINT) AS n_tok
             |      FROM documents),
             |s AS (SELECT doc_id, n_tok,
             |        ntile(4) OVER (ORDER BY n_tok, doc_id) AS phase FROM t)
             |SELECT doc_id, n_tok, CAST(phase AS BIGINT) AS phase
             |FROM s ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_tok"))
        ScaleRank.withGlobalRank(t, "n_tok", "doc_id", rkName = "__rk",
            nName = Some("__n"))
          .withColumn("phase",
            ScaleRank.ntileFromRank(col("__rk"), col("__n"), 4))
          .select(col("doc_id"), col("n_tok"), col("phase"))
          .orderBy("doc_id")
      }))
}
