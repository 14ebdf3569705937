package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-35 operators: corpus novelty scoring and the Wilson
  * confidence interval.
  */
object Extras37 {

  def queries: Seq[Q] = Seq(
    // novelty: the share of each document's distinct shingles that no
    // EARLIER document (by id) contains — "how much new content does
    // this doc add", the ordering-aware curation metric that caps
    // boilerplate accumulation. First-occurrence ownership is one
    // min-aggregation over the inverted index (the same shingle
    // tokenization as the dedup family), joined back per doc.
    Q("text_novelty",
      Some("""WITH d AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
             |    THEN list_transform(range(len(toks)-2),
             |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
             |    ELSE [array_to_string(toks, ' ')] END) AS sh
             |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS toks
             |        FROM documents) t),
             |inv AS (SELECT doc_id, unnest(sh) AS ng FROM d),
             |own AS (SELECT ng, CAST(min(doc_id) AS BIGINT) AS first_doc
             |        FROM inv GROUP BY 1)
             |SELECT inv.doc_id,
             |       CAST(count(*) AS BIGINT) AS n_shingles,
             |       CAST(count(*) FILTER (WHERE own.first_doc = inv.doc_id) AS BIGINT)
             |         AS n_novel,
             |       CAST(round(CAST(count(*) FILTER (WHERE own.first_doc = inv.doc_id)
             |            AS DOUBLE) * 1e6 / count(*)) AS BIGINT) AS novelty_e6
             |FROM inv JOIN own USING (ng)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        graft.plans.GraftFunctions.register(s)
        // localCheckpoint: inv feeds BOTH the ownership aggregate and
        // the join probe side, and Spark does not reuse the scan
        // across the two subtrees — without the materialization the
        // corpus's most expensive projection (tokenize + shingle
        // explode) runs twice (the dedup_lines lesson; the
        // materialized set is the inverted index a pipeline persists
        // anyway)
        val inv = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(call_function("shingles", col("text"))))
              .as("ng"))
          .localCheckpoint()
        val own = inv.groupBy("ng")
          .agg(min("doc_id").cast("long").as("first_doc"))
        inv.join(own, "ng")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            count(when(col("first_doc") === col("doc_id"), 1)).cast("long")
              .as("n_novel"),
            expr("""CAST(round(CAST(count(CASE WHEN first_doc = doc_id THEN 1 END)
                   | AS DOUBLE) * 1e6 / count(*)) AS BIGINT)""".stripMargin)
              .as("novelty_e6"))
          .orderBy("doc_id")
      }),

    // Wilson score interval for the fulfilled-order rate per priority:
    // the binomial CI that behaves at extreme rates (unlike the normal
    // approximation) — lower/upper bounds in one closed form over the
    // exact (successes, trials) pair, z = 1.96.
    Q("stat_wilson_ci",
      Some("""WITH g AS (SELECT o_orderpriority AS pri,
             |             CAST(count(*) AS BIGINT) AS n,
             |             CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS x
             |           FROM orders GROUP BY 1)
             |SELECT pri, n, x,
             |       CAST(round((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
             |            - 1.96 * sqrt((CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
             |                          + 1.96 * 1.96 / (4 * n)) / n))
             |            / (1 + 1.96 * 1.96 / n) * 1e6) AS BIGINT) AS lo_e6,
             |       CAST(round((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
             |            + 1.96 * sqrt((CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
             |                          + 1.96 * 1.96 / (4 * n)) / n))
             |            / (1 + 1.96 * 1.96 / n) * 1e6) AS BIGINT) AS hi_e6
             |FROM g ORDER BY pri""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).cast("long").as("n"),
          count(when(col("o_orderstatus") === "F", 1)).cast("long").as("x"))
        .select(col("pri"), col("n"), col("x"),
          expr("""CAST(round((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
                 | - 1.96 * sqrt((CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
                 |               + 1.96 * 1.96 / (4 * n)) / n))
                 | / (1 + 1.96 * 1.96 / n) * 1e6) AS BIGINT)""".stripMargin)
            .as("lo_e6"),
          expr("""CAST(round((CAST(x AS DOUBLE) / n + 1.96 * 1.96 / (2 * n)
                 | + 1.96 * sqrt((CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
                 |               + 1.96 * 1.96 / (4 * n)) / n))
                 | / (1 + 1.96 * 1.96 / n) * 1e6) AS BIGINT)""".stripMargin)
            .as("hi_e6"))
        .orderBy("pri")))
}
