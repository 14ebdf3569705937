package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-15 operators: the medallion (bronze→silver→gold)
  * pipeline, add-1-smoothed bigram LM scoring, cross-source dedup
  * reporting, burst detection, and the multimodal shard manifest.
  */
object Extras18 {

  def queries: Seq[Q] = Seq(
    // medallion pipeline as ONE composed plan: bronze (raw events) →
    // silver (exactly-one-row-per-event_id, typed cents + parsed JSON
    // prop) → gold (daily per-type metrics incl. exact distinct
    // users). The dedupe window and the gold aggregation share the
    // same day/type downstream; silver is never materialized — the
    // optimizer fuses the layers, which is the point of declaring the
    // pipeline as one plan.
    Q("pipeline_medallion",
      Some("""WITH silver AS (
             |  SELECT event_id, ts, user_id, event_type,
             |         CAST(round(value * 100) AS BIGINT) AS cents,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
             |                                     ORDER BY ts, user_id, value, props) AS rn
             |        FROM events) t
             |  WHERE rn = 1)
             |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(cents) AS BIGINT) AS cents,
             |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
             |       CAST(sum(k) AS BIGINT) AS k_total
             |FROM silver GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin),
      (s, d) => {
        val silver = Tables.events(s, d)
          // the dedupe ORDER BY is a TOTAL order over the payload
          // (ts, user, value, props): duplicate event_ids tying on
          // (ts, user) but differing in payload would otherwise keep
          // an engine/partitioning-dependent survivor
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_id")
              .orderBy("ts", "user_id", "value", "props")))
          .filter(col("rn") === 1)
          .select(col("ts"), col("user_id"), col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        silver.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum("cents").cast("long").as("cents"),
            countDistinct("user_id").cast("long").as("users"),
            sum("k").cast("long").as("k_total"))
          .orderBy("day", "event_type")
      }),

    // add-1-smoothed bigram language-model score per document:
    // Σ ln((c(w₁w₂)+1)/(c(w₁)+V)) over the doc's bigram INSTANCES,
    // each term µ-rounded before the associative BIGINT sum. Corpus
    // bigram/unigram counts and |V| come off the shared tokenization;
    // the per-doc join keys on the bigram.
    Q("text_bigram_lm",
      Some("""WITH toks AS (SELECT doc_id,
             |                string_split_regex(lower(trim(text)), ' +') AS tk
             |              FROM documents),
             |bgd AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2
             |        FROM (SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
             |                THEN list_transform(range(len(tk)-1),
             |                     i -> [tk[i+1], tk[i+2]])
             |                ELSE [] END) AS pr
             |              FROM toks) t),
             |bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab
             |        FROM bgd GROUP BY 1, 2),
             |uni AS (SELECT unnest(tk) AS w FROM toks),
             |unic AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),
             |vq AS (SELECT CAST(count(*) AS BIGINT) AS v FROM unic)
             |SELECT bgd.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |       CAST(sum(CAST(round(ln((bgc.n_ab + 1)
             |            / CAST(unic.n + vq.v AS DOUBLE)) * 1e6) AS BIGINT)) AS BIGINT)
             |         AS lm_e6
             |FROM bgd JOIN bgc USING (w1, w2)
             |         JOIN unic ON unic.w = bgd.w1 CROSS JOIN vq
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("tk"))
        val bgd = toks
          .select(col("doc_id"),
            explode(graft.text.TextAnalysis.bigramPairsCol(col("tk"))).as("pr"))
          .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        val bgc = bgd.groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("n_ab"))
        val unic = toks.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
        val vq = unic.agg(count(lit(1)).cast("long").as("v"))
        bgd.join(bgc, Seq("w1", "w2"))
          .join(unic.withColumnRenamed("w", "w1"), "w1")
          .crossJoin(broadcast(vq))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_bigrams"),
            sum(expr("CAST(round(ln((n_ab + 1) / CAST(n + v AS DOUBLE)) * 1e6) AS BIGINT)"))
              .cast("long").as("lm_e6"))
          .orderBy("doc_id")
      }),

    // cross-source boilerplate report: 8-token PREFIX fingerprints
    // whose copies span MORE THAN ONE source — the corpus-merge
    // diagnostic for shared headers/templates that full-document
    // hashing misses (and which, in this corpus, fires at every SF
    // while exact duplication only appears at sf0.1). One aggregation
    // on the prefix fingerprint; sources counted exactly.
    Q("dedup_cross_source",
      Some("""SELECT md5(array_to_string(
             |         string_split_regex(lower(trim(text)), ' +')[1:8], ' ')) AS fp,
             |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(min(doc_id) AS BIGINT) AS keep_id
             |FROM documents
             |GROUP BY 1 HAVING count(DISTINCT source) > 1
             |ORDER BY keep_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(concat_ws(" ",
          slice(split(lower(trim(col("text"))), " +"), 1, 8))).as("fp"))
        .agg(countDistinct("source").cast("long").as("n_sources"),
          count(lit(1)).cast("long").as("n_docs"),
          min("doc_id").cast("long").as("keep_id"))
        .filter(col("n_sources") > 1)
        .orderBy("keep_id")),

    // burst detection: an hour is a burst when its count exceeds 3×
    // the trailing-24-observed-hours average — compared WITHOUT
    // division (c·n₂₄ > 3·s₂₄, exact integers), gated on ≥12 hours of
    // history so cold starts can't fire. One shuffle on event_type.
    Q("ts_bursts",
      Some("""WITH h AS (SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             |             CAST(count(*) AS BIGINT) AS c
             |           FROM events GROUP BY 1, 2),
             |f AS (SELECT event_type, hr, c,
             |        CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY hr
             |             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s24,
             |        CAST(count(c) OVER (PARTITION BY event_type ORDER BY hr
             |             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n24
             |      FROM h)
             |SELECT event_type, hr, c, s24, n24,
             |       CAST(n24 >= 12 AND c * n24 > 3 * s24 AS BOOLEAN) AS burst
             |FROM f ORDER BY event_type, hr""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("hr")
          .rowsBetween(-24, -1)
        Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).cast("long").as("c"))
          .withColumn("s24", coalesce(sum("c").over(w), lit(0)).cast("long"))
          .withColumn("n24", count("c").over(w).cast("long"))
          .select(col("event_type"), col("hr"), col("c"), col("s24"), col("n24"),
            (col("n24") >= 12 && col("c") * col("n24") > col("s24") * 3).as("burst"))
          .orderBy("event_type", "hr")
      }),

    // multimodal shard manifest (WebDataset-style): per shard, item
    // count, total payload bytes, and a content manifest hash — the
    // md5 of the doc-ordered concatenation of per-item md5s, so any
    // item change, addition, or reorder changes the shard hash. The
    // per-shard fold is one aggregation; the deterministic order comes
    // from sorting the collected (id, md5) structs, not from row
    // arrival. Buffer bound: one (id, 32-char md5) struct per shard
    // MEMBER — bounded by shard construction, not the corpus (a
    // WebDataset-style shard is sized to ~10⁴ items / ~1 GB by the
    // packing step; doc_id % 8 stands in for that shard key here). A
    // manifest is inherently a function of every member, so the right
    // control is shard sizing, not a collect cap that would silently
    // hash a subset.
    Q("mm_manifest",
      Some("""SELECT doc_id % 8 AS shard,
             |       CAST(count(*) AS BIGINT) AS n_items,
             |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS manifest_md5
             |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select((col("doc_id") % 8).as("shard"), col("doc_id"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
          md5(col("text")).as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).cast("long").as("n_items"),
          sum("n_bytes").cast("long").as("total_bytes"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("h")))),
            x => x.getField("h")), "")).as("manifest_md5"))
        .orderBy("shard")))
}
