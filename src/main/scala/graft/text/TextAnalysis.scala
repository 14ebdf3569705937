package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline [EXT]
  * (BASELINE.json north_star): language-ID, quality scoring, token
  * counting, document fingerprinting. All pure Column compositions —
  * no UDFs, fully codegen'd, linear scans that scale to 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count (single-space corpus: exact). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), " +")).cast("long"))

  /** BPE-ish subword-regex token count: alpha runs, digit runs, or a
    * single non-alnum non-space char each count as one token. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0))).cast("long")

  /** Stopword-hit count (lexicon intersects the testdata vocabulary). */
  val StopwordPattern = "\\b(the|a|an|and|of|to|in)\\b"
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(StopwordPattern), lit(0))).cast("long")

  /** Punctuation-character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Lower-cased word bigrams ("a b" strings); sub-2-token docs yield an
    * empty array. Shared by the text_ngram_counts query and its spec so
    * the tested expression IS the shipped one. */
  def bigramsCol(text: Column): Column = {
    val toks = split(lower(trim(text)), " +")
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
  }

  /** Overlapping token windows (size [[ChunkSize]], stride
    * [[ChunkStride]]) over an ALREADY-split token array: window i
    * covers toks[i·stride+1 .. i·stride+size]; starts step by the
    * stride until the document is exhausted, and the final partial
    * window is kept. ONE definition shared by the standalone
    * text_chunks op and the composed pipeline_training_corpus so the
    * two cannot drift (a size/stride/partial-window change edits one
    * builder, not two inlined copies). */
  val ChunkSize = 32
  val ChunkStride = 16
  def chunkWindowsCol(toks: Column): Column =
    transform(
      sequence(lit(0),
        ceil(greatest(size(toks) - ChunkSize, lit(0)) / ChunkStride.toDouble)
          .cast("int")),
      ci => slice(toks, ci * ChunkStride + 1, lit(ChunkSize)))

  /** Adjacent-token pairs as structs (w1, w2) from an ALREADY-split
    * token array column; sub-2-token docs yield an empty array. The
    * struct form (vs the joined-string bigram) keeps both words
    * addressable for the association join in text_bigram_assoc. */
  def bigramPairsCol(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2), i =>
        struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Word trigrams ("a b c" strings) from an ALREADY-split token
    * array; sub-3-token docs yield an empty array. The `when` guard
    * matters: Spark's `sequence(0, size-3)` on a 2-token doc would be
    * sequence(0, -1) — a DESCENDING two-element range, not empty. */
  def trigramsCol(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** Quality features + a composite score in [0,1]-ish range. Division
    * guards via nullif so empty docs yield NULL, never an ANSI error. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nTok = tokenCount(text)
    val nChar = length(text).cast("long")
    val avgTokLen = length(regexp_replace(text, " ", "")).cast("double") /
      nullif(nTok, lit(0L))
    val stopRatio = stopwordCount(text).cast("double") / nullif(nTok, lit(0L))
    val punctRatio = punctCount(text).cast("double") / nullif(nChar, lit(0L))
    Seq(
      "n_tokens" -> nTok,
      "n_chars_m" -> nChar,
      "avg_token_len" -> avgTokLen,
      "stopword_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio)
  }

  /** Canonical document fingerprint: md5 of the whitespace-normalized,
    * lower-cased text — the exact-dedup key that is robust to casing and
    * whitespace drift. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** 64-bit content hash (xxhash64) — cheap shard/dedup key. */
  def fingerprint64(text: Column): Column =
    xxhash64(lower(trim(regexp_replace(text, "\\s+", " "))))

  // --- language ID -------------------------------------------------------

  /** Stopword-profile language scorer: count hits from each language's
    * marker lexicon, pick the argmax (ties → fixed priority order),
    * 'und' when nothing matches. CJK presence short-circuits to 'zh'.
    * A heuristic n-gram scorer, not a model — deterministic by design. */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of|to|is|in|that|it|for)\\b",
    "fr" -> "\\b(le|la|les|et|de|un|une|est|que|pour)\\b",
    "es" -> "\\b(el|los|las|y|de|un|una|es|que|por)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|eine|zu|den|von)\\b")

  def langId(text: Column): Column = {
    val t = lower(text)
    val scores = langMarkers.map { case (lang, pat) =>
      lang -> size(regexp_extract_all(t, lit(pat), lit(0)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    scores.foldLeft(
      when(cjk > 0, "zh")) { case (acc, (lang, sc)) =>
        acc.when(sc === best && best > 0, lang)
      }.otherwise("und")
  }

  /** Interpolated Kneser-Ney bigram score per document (see the
    * text_bigram_kn registration for the formula and determinism
    * notes). All statistics come off ONE bigram-count relation; the
    * single ln term per instance is µ-rounded before the associative
    * BIGINT sum, and its arithmetic spelling is character-identical
    * to the DuckDB oracle's. */
  def knBigramReport(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("tk"))
    val bgd = toks
      .select(col("doc_id"), explode(bigramPairsCol(col("tk"))).as("pr"))
      .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
    val bgc = bgd.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("n_ab"))
    val ftot = bgc.groupBy("w1").agg(sum("n_ab").cast("long").as("tot"),
      count(lit(1)).cast("long").as("n1p"))
    val lcnt = bgc.groupBy("w2").agg(count(lit(1)).cast("long").as("lcont"))
    val tq = bgc.agg(count(lit(1)).cast("long").as("t"))
    bgd.join(bgc, Seq("w1", "w2")).join(ftot, "w1").join(lcnt, "w2")
      .crossJoin(broadcast(tq))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(expr("CAST(round(ln((n_ab - 0.75 + 0.75 * n1p" +
          " * (CAST(lcont AS DOUBLE) / t)) / tot) * 1e6) AS BIGINT)"))
          .cast("long").as("kn_e6"))
      .orderBy("doc_id")
  }
}
