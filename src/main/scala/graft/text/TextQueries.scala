package graft.text

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.functions._

/** Registered text-analysis queries over the `documents` table.
  * Everything here is formula-exact in both engines (regexp counts +
  * integer/double arithmetic, no accumulation), so every query carries a
  * DuckDB oracle.
  */
object TextQueries {

  // DuckDB-side building blocks, kept textually adjacent to the Spark
  // Column versions in TextAnalysis so they evolve together.
  private val dTok =
    "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), ' +')) END"
  private val dBpe =
    "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"
  private val dStop =
    "len(regexp_extract_all(lower(text), '\\b(the|a|an|and|of|to|in)\\b'))"
  private val dPunct =
    "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"

  def queries: Seq[Q] = Seq(
    // token counting: whitespace tokens + BPE-ish subword-regex tokens.
    Q("text_tokens",
      Some(s"""SELECT doc_id,
              |       CAST($dTok AS BIGINT) AS n_ws_tokens,
              |       CAST($dBpe AS BIGINT) AS n_bpe_tokens
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    // quality scoring: length/stopword/punctuation features.
    Q("text_quality",
      Some(s"""SELECT doc_id,
              |       CAST($dTok AS BIGINT) AS n_tokens,
              |       CAST(length(text) AS BIGINT) AS n_chars_m,
              |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
              |         / nullif(CAST($dTok AS BIGINT), 0) AS avg_token_len,
              |       CAST($dStop AS DOUBLE)
              |         / nullif(CAST($dTok AS BIGINT), 0) AS stopword_ratio,
              |       CAST($dPunct AS DOUBLE)
              |         / nullif(CAST(length(text) AS BIGINT), 0) AS punct_ratio
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val cols = TextAnalysis.qualityColumns(col("text"))
          .map { case (n, c) => c.as(n) }
        documents(s, d).select(col("doc_id") +: cols: _*).orderBy("doc_id")
      }),

    // document fingerprinting: md5 of normalized text.
    Q("text_fingerprint",
      Some("""SELECT doc_id,
             |       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // corpus word frequency: explode → count → top-20 (the UDTF-shaped
    // generator op; plans explode + partial/final hash aggregate).
    Q("text_wordcount",
      Some("""SELECT word, count(*) AS cnt FROM (
             |  SELECT unnest(string_split_regex(trim(text), ' +')) AS word
             |  FROM documents) t
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin),
      (s, d) => documents(s, d)
        .select(explode(split(trim(col("text")), " +")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word")).limit(20)),

    // language ID: stopword-profile heuristic, argmax with fixed
    // tie-break order (en, fr, es, de), CJK short-circuit.
    Q("text_langid",
      Some("""SELECT doc_id, lang,
             |  CASE
             |    WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
             |    WHEN s_en = best AND best > 0 THEN 'en'
             |    WHEN s_fr = best AND best > 0 THEN 'fr'
             |    WHEN s_es = best AND best > 0 THEN 'es'
             |    WHEN s_de = best AND best > 0 THEN 'de'
             |    ELSE 'und' END AS lang_pred
             |FROM (
             |  SELECT doc_id, lang, text,
             |    len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|is|in|that|it|for)\b')) AS s_en,
             |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|est|que|pour)\b')) AS s_fr,
             |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|de|un|una|es|que|por)\b')) AS s_es,
             |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein|eine|zu|den|von)\b')) AS s_de,
             |    greatest(
             |      len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|is|in|that|it|for)\b')),
             |      len(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|est|que|pour)\b')),
             |      len(regexp_extract_all(lower(text), '\b(el|los|las|y|de|un|una|es|que|por)\b')),
             |      len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein|eine|zu|den|von)\b'))) AS best
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"))
  )
}
