package graft.text

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Registered dedup queries over `documents`. The fuzzy variants return
  * the KEPT corpus (dedup's actual contract, and guaranteed non-empty
  * for the rows-only check); pair-level outputs are unit-tested with
  * synthetic near-duplicates where the testdata has none.
  */
object DedupQueries {

  def queries: Seq[Q] = Seq(
    // exact dedup, deterministic survivor: min doc_id per distinct text.
    Q("dedup_exact",
      Some("""SELECT text, min(doc_id) AS doc_id FROM documents
             |GROUP BY text ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).groupBy("text")
        .agg(min("doc_id").as("doc_id")).orderBy("doc_id")),

    // exact full-row distinct (dropDuplicates over every column).
    Q("dedup_distinct_rows",
      Some("SELECT DISTINCT * FROM documents ORDER BY doc_id"),
      (s, d) => documents(s, d).distinct().orderBy("doc_id")),

    // normalized-fingerprint dedup: whitespace/case-insensitive exact.
    Q("dedup_fingerprint",
      Some("""SELECT fp, min(doc_id) AS doc_id FROM (
             |  SELECT doc_id,
             |         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |  FROM documents) t
             |GROUP BY fp ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).orderBy("doc_id")),

    // MinHash+LSH near-dedup → kept corpus (shingle → 64 minhashes →
    // 16×4 band buckets → candidate join → exact-Jaccard verify ≥ 0.7).
    Q("dedup_minhash",
      None,
      (s, d) => Dedup.dedupMinHash(documents(s, d), "doc_id", "text")
        .select("doc_id").orderBy("doc_id")),

    // SimHash fingerprints (+ prefix bucket) for every doc.
    Q("dedup_simhash",
      None,
      (s, d) => Dedup.withSimHash(documents(s, d), "text")
        .select("doc_id", "simhash", "sim_bucket").orderBy("doc_id")),

    // n-gram-Jaccard near-dedup → kept corpus (inverted index with
    // df-cutoff, count-based Jaccard ≥ 0.5).
    Q("dedup_ngram",
      None,
      (s, d) => Dedup.dedupNgram(documents(s, d), "doc_id", "text")
        .select("doc_id").orderBy("doc_id"))
  )
}
