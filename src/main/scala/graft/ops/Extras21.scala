package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-18 operators: lexical-diversity scoring, the
  * per-source duplication report, and the compressed-CSV roundtrip.
  */
object Extras21 {

  def queries: Seq[Q] = Seq(
    // lexical diversity per document: type-token ratio and hapax share
    // (tokens whose CORPUS frequency is 1) — the vocabulary-richness
    // signals corpus filters use next to repetition scores. Everything
    // derives from the shared (doc, term, tf) table: distinct terms =
    // rows, tokens = Σtf, hapax joins the corpus-frequency reduction.
    Q("text_lexical_diversity",
      Some("""WITH tok AS (SELECT doc_id,
             |              unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1)
             |SELECT tf.doc_id,
             |       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
             |       CAST(count(*) AS BIGINT) AS n_types,
             |       CAST(round(CAST(count(*) AS DOUBLE) * 1e6 / sum(tf.tf)) AS BIGINT)
             |         AS ttr_e6,
             |       CAST(sum(CASE WHEN cf.cf = 1 THEN tf.tf ELSE 0 END) AS BIGINT)
             |         AS n_hapax_tokens
             |FROM tf JOIN cf USING (term)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val tf = graft.text.TokenStats.docTermFreq(Tables.documents(s, d))
        val cf = tf.groupBy("term").agg(sum("tf").cast("long").as("cf"))
        tf.join(cf, "term")
          .groupBy("doc_id")
          .agg(sum("tf").cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_types"),
            expr("CAST(round(CAST(count(*) AS DOUBLE) * 1e6 / sum(tf)) AS BIGINT)")
              .as("ttr_e6"),
            sum(when(col("cf") === 1, col("tf")).otherwise(0)).cast("long")
              .as("n_hapax_tokens"))
          .orderBy("doc_id")
      }),

    // per-source duplication report over the shared verified pair
    // stream: how many near-dup pairs stay WITHIN each source vs cross
    // into another — the diagnostic that attributes duplication to a
    // feed. The doc→source lookup broadcasts; the pair table is the
    // materialized edge set, so this is a reduction over a tiny input.
    Q("dedup_source_report",
      Some(s"""${graft.text.DedupQueries.jaccardCtePrefix},
             |e AS (SELECT ia, ib FROM pairs
             |      JOIN sizes sa ON sa.doc_id = pairs.ia
             |      JOIN sizes sb ON sb.doc_id = pairs.ib
             |      WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.7),
             |lab AS (SELECT e.ia, e.ib, da.source AS sa, db.source AS sb
             |        FROM e JOIN documents da ON da.doc_id = e.ia
             |               JOIN documents db ON db.doc_id = e.ib),
             |w AS (SELECT sa AS wsrc, CAST(count(*) AS BIGINT) AS n_within
             |      FROM lab WHERE sa = sb GROUP BY 1),
             |x AS (SELECT xsrc, CAST(sum(n) AS BIGINT) AS n_cross FROM (
             |        SELECT sa AS xsrc, count(*) AS n FROM lab
             |        WHERE sa <> sb GROUP BY 1
             |        UNION ALL
             |        SELECT sb, count(*) FROM lab WHERE sa <> sb GROUP BY 1) u
             |      GROUP BY 1),
             |base AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
             |         FROM documents GROUP BY 1)
             |SELECT base.source, base.n_docs,
             |       CAST(coalesce(w.n_within, 0) AS BIGINT) AS n_within_pairs,
             |       CAST(coalesce(x.n_cross, 0) AS BIGINT) AS n_cross_pairs
             |FROM base LEFT JOIN w ON w.wsrc = base.source
             |          LEFT JOIN x ON x.xsrc = base.source
             |ORDER BY source""".stripMargin),
      (s, d) => {
        val docs = Tables.documents(s, d)
        val src = docs.select(col("doc_id"), col("source"))
        val e = graft.text.Dedup.nearDupPairs(docs, "doc_id", "text", 0.7)
        // the doc-metadata side SCALES with the corpus — unhinted;
        // the verified-pair side is the small one, AQE builds on it
        val lab = e
          .join(src.select(col("doc_id").as("id_a"),
            col("source").as("sa")), "id_a")
          .join(src.select(col("doc_id").as("id_b"),
            col("source").as("sb")), "id_b")
        val within = lab.filter(col("sa") === col("sb"))
          .groupBy(col("sa").as("source")).agg(count(lit(1)).as("n_within"))
        val cross = lab.filter(col("sa") =!= col("sb"))
          .select(col("sa").as("source"))
          .unionAll(lab.filter(col("sa") =!= col("sb"))
            .select(col("sb").as("source")))
          .groupBy("source").agg(count(lit(1)).cast("long").as("n_cross"))
        docs.groupBy("source").agg(countDistinct("doc_id").cast("long").as("n_docs"))
          .join(broadcast(within), Seq("source"), "left")
          .join(broadcast(cross), Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_within"), lit(0)).cast("long").as("n_within_pairs"),
            coalesce(col("n_cross"), lit(0)).cast("long").as("n_cross_pairs"))
          .orderBy("source")
      }),

    // compressed-CSV sink roundtrip: gzip codec on write, transparent
    // decompression on read — the wire-format variant of sink_csv
    // (splittability note: gzip files are NOT splittable; at 100 TB
    // write many moderate files or use zstd parquet instead).
    Q("sink_csv_gzip",
      Some("SELECT * FROM customer ORDER BY c_custkey"),
      (s, d) => {
        val src = Tables.customer(s, d)
        val out = s"${sys.props("java.io.tmpdir")}/graft_sink_csv_gz_" +
          d.replaceAll("[^A-Za-z0-9]", "_")
        src.write.mode("overwrite")
          .option("header", "true").option("compression", "gzip").csv(out)
        s.read.schema(src.schema).option("header", "true").csv(out)
          .orderBy("c_custkey")
      }))
}
