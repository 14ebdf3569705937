package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-5 wave-49 operators: 13-gram exact decontamination, the
  * Poisson bootstrap, and the dedup threshold sweep.
  */
object Extras49 {

  def queries: Seq[Q] = Seq(
    // 13-gram exact decontamination (the published GPT-3-style rule):
    // a train document is contaminated if it shares ANY exact 13-gram
    // with the eval set (doc_id % 10 = 0 stands in for the benchmark).
    // Reports each contaminated train doc with its distinct shared
    // 13-gram count. Scale shape: the eval n-gram set is
    // benchmark-sized (≪ corpus) so the join's build side broadcasts;
    // the train explode streams map-side into it — the corpus never
    // self-joins. Docs under 13 tokens have no 13-grams and cannot be
    // contaminated (same rule both engines). Production hashes the
    // 13-gram strings to 64-bit before the join; the literal strings
    // keep the oracle readable.
    Q("dedup_decontaminate13",
      Some("""WITH t AS (SELECT doc_id,
             |            string_split_regex(lower(trim(text)), ' +') AS toks
             |          FROM documents),
             |g AS (SELECT doc_id, array_to_string(toks[i+1 : i+13], ' ') AS ng
             |      FROM t, LATERAL unnest(range(len(toks) - 12)) u(i)
             |      WHERE len(toks) >= 13),
             |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 10 = 0),
             |tr AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 0)
             |SELECT doc_id, CAST(count(DISTINCT tr.ng) AS BIGINT) AS n_hits13
             |FROM tr JOIN ev ON tr.ng = ev.ng
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val toks = split(lower(trim(col("text"))), " +")
        // localCheckpoint: grams feeds BOTH the eval-distinct side and
        // the train probe — without it the corpus scan + 13-gram
        // explode (the plan's dominant cost) runs twice (the
        // dedup_lines/text_novelty lesson)
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .filter(size(col("toks")) >= 13)
          .select(col("doc_id"),
            explode(transform(sequence(lit(0), size(col("toks")) - 13),
              i => array_join(slice(col("toks"), i + 1, lit(13)), " "))).as("ng"))
          .localCheckpoint()
        val ev = grams.filter(col("doc_id") % 10 === 0)
          .select("ng").distinct()
        grams.filter(col("doc_id") % 10 =!= 0)
          .join(broadcast(ev), "ng")
          .groupBy("doc_id")
          .agg(countDistinct("ng").cast("long").as("n_hits13"))
          .orderBy("doc_id")
      }),

    // Poisson bootstrap of mean customer revenue — THE distributed
    // bootstrap (each row draws an independent Poisson(1) replicate
    // weight, so no replicate ever needs a global resample pass). 100
    // replicates in one plan: weights come from the corpus's Knuth
    // multiplicative hash on (customer, replicate) compared against
    // fixed 2³²-scaled Poisson CDF thresholds — pure integers, so both
    // engines draw the IDENTICAL bootstrap sample; replicate means
    // µ-round once, and the 2.5/50/97.5 percentiles are element picks
    // over the 100 exact BIGINT means. Scale: the fact reduces per
    // customer first; the 100× explode rides the reduced table, and
    // everything after is one partial+final aggregation per replicate.
    // (At 10⁹ customers, mod the hash input before multiplying to stay
    // in BIGINT range.)
    Q("stat_bootstrap_ci",
      Some("""WITH r AS (SELECT o_custkey AS ck,
             |            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |                 AS BIGINT) AS rev
             |          FROM orders GROUP BY 1),
             |b AS (SELECT ck, rev, CAST(bi AS BIGINT) AS bi,
             |        (CAST(ck * 100 + bi + 1 AS HUGEINT) * 2654435761) % 4294967296 AS h
             |      FROM r, LATERAL unnest(range(100)) u(bi)),
             |w AS (SELECT bi, rev,
             |        CASE WHEN h < 1580030168 THEN 0
             |             WHEN h < 3160060337 THEN 1
             |             WHEN h < 3950075421 THEN 2
             |             WHEN h < 4213413783 THEN 3
             |             WHEN h < 4279248373 THEN 4
             |             WHEN h < 4292415291 THEN 5
             |             ELSE 6 END AS w
             |      FROM b),
             |m AS (SELECT bi,
             |        CAST(round(CAST(sum(w * rev) AS DOUBLE)
             |             / nullif(sum(w), 0)) AS BIGINT) AS mean_cents
             |      FROM w GROUP BY 1)
             |SELECT CAST(count(mean_cents) AS BIGINT) AS n_reps,
             |       CAST(quantile_disc(mean_cents, 0.025) AS BIGINT) AS lo_cents,
             |       CAST(quantile_disc(mean_cents, 0.5) AS BIGINT) AS med_cents,
             |       CAST(quantile_disc(mean_cents, 0.975) AS BIGINT) AS hi_cents
             |FROM m""".stripMargin),
      (s, d) => {
        val r = Tables.orders(s, d).groupBy(col("o_custkey").as("ck"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .cast("long").as("rev"))
        val b = r.select(col("ck"), col("rev"),
            explode(sequence(lit(0L), lit(99L))).as("bi"))
          // Knuth product in DECIMAL(38,0)/HUGEINT: the 64-bit
          // product wraps at ck ≈ 3.47e7 (≈ SF 230), where the
          // sign-preserving % would zero the weight of every high-ck
          // customer while DuckDB errors (the sample_bernoulli class)
          .withColumn("h",
            expr("""(CAST(ck * 100 + bi + 1 AS DECIMAL(38,0)) * 2654435761)
                   | % 4294967296""".stripMargin))
        val w = b.withColumn("w",
          when(col("h") < 1580030168L, 0L)
            .when(col("h") < 3160060337L, 1L)
            .when(col("h") < 3950075421L, 2L)
            .when(col("h") < 4213413783L, 3L)
            .when(col("h") < 4279248373L, 4L)
            .when(col("h") < 4292415291L, 5L)
            .otherwise(6L))
        w.groupBy("bi")
          .agg(expr("CAST(round(CAST(sum(w * rev) AS DOUBLE) / nullif(sum(w), 0)) AS BIGINT)")
            .as("mean_cents"))
          // percentile_disc's buffer is FINE here: the input is the
          // 100 bootstrap replicate means — a fixed REPLICATE count
          // independent of data scale, so the buffer is 100 longs at
          // any SF. SCALE.md round-7 bounded-group policy; not a
          // distributed-CDF candidate.
          .agg(count(col("mean_cents")).cast("long").as("n_reps"),
            expr("CAST(percentile_disc(0.025) WITHIN GROUP (ORDER BY mean_cents) AS BIGINT)")
              .as("lo_cents"),
            expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_cents) AS BIGINT)")
              .as("med_cents"),
            expr("CAST(percentile_disc(0.975) WITHIN GROUP (ORDER BY mean_cents) AS BIGINT)")
              .as("hi_cents"))
      }),

    // dedup threshold sweep: pair and affected-doc counts at every
    // Jaccard cutoff 0.50–0.95 (twentieths) in ONE pass over the
    // memoized exact shared-shingle pair table — the data a dedup
    // rollout reads to pick its threshold (pair mass vs corpus loss).
    // The 10-threshold explode rides the tiny pair table; both engines
    // compare the identical j double against t/20.
    Q("dedup_threshold_sweep",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |wp AS (SELECT ia, ib,
             |         CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) AS j
             |       FROM pairs
             |       JOIN sizes sa ON sa.doc_id = pairs.ia
             |       JOIN sizes sb ON sb.doc_id = pairs.ib),
             |sw AS (SELECT t, ia, ib FROM wp, LATERAL unnest(range(10, 20)) u(t)
             |       WHERE j >= CAST(t AS DOUBLE) / 20),
             |np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs
             |       FROM sw GROUP BY 1),
             |nd AS (SELECT t, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
             |       FROM (SELECT t, ia AS d FROM sw
             |             UNION ALL SELECT t, ib FROM sw) u2 GROUP BY 1)
             |SELECT CAST(np.t AS BIGINT) AS t20, np.n_pairs, nd.n_docs
             |FROM np JOIN nd ON np.t = nd.t ORDER BY t20""".stripMargin),
      (s, d) => {
        val wp = graft.text.Dedup
          .sharedShinglePairs(Tables.documents(s, d), "doc_id", "text")
          .select(col("id_a").as("ia"), col("id_b").as("ib"),
            (col("n_shared").cast("double") /
              (col("na") + col("nb") - col("n_shared"))).as("j"))
        val sw = wp
          .select(col("ia"), col("ib"), col("j"),
            explode(sequence(lit(10L), lit(19L))).as("t"))
          .filter(col("j") >= col("t").cast("double") / 20)
        val np = sw.groupBy("t").agg(count(lit(1)).cast("long").as("n_pairs"))
        val nd = sw.select(col("t"), explode(array(col("ia"), col("ib"))).as("d"))
          .groupBy("t").agg(countDistinct("d").cast("long").as("n_docs"))
        np.join(nd, "t")
          .select(col("t").as("t20"), col("n_pairs"), col("n_docs"))
          .orderBy("t20")
      }))
}
