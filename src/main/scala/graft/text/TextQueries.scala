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

  /** Memo of the quality-gate survivor set (doc_id, source, text, fp):
    * pipeline_quality_gate and pipeline_training_corpus apply the
    * IDENTICAL gate (token band + punctuation ceiling + language
    * filter), and the language-ID scoring battery inside it is the
    * heaviest scalar work in the text family — materialize the
    * survivors once, let both consumers read them.
    *
    * SINGLE-slot, data-versioned — two defects of the old unbounded
    * (session, dir)-keyed map designed out: (1) replacing the slot
    * unpersists the prior survivor set, so a suite that opens a fresh
    * SparkSession per spec no longer pins one persisted frame (plus the
    * session the key retained) per spec for the JVM lifetime — the
    * steady state is exactly one live entry; (2) the key carries a
    * part-file (name, size, mtime) signature, so a documents.parquet
    * rewritten in place is a cache MISS, not a stale hit (the same
    * versioning contract as the events stream staging). An unpersist
    * under a concurrently-running consumer is safe: blocks drop, the
    * running job recomputes from lineage. */
  private final case class GateKey(
      session: org.apache.spark.sql.SparkSession, dir: String, sig: String)
  private var gateSlot: Option[(GateKey, org.apache.spark.sql.DataFrame)] = None

  private def docsSig(d: String): String = {
    val f = new java.io.File(d, "documents.parquet")
    if (f.isFile) s"${f.length}:${f.lastModified}"
    else Option(f.listFiles()).map(_.sortBy(_.getName)
      .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
      .mkString("|")).getOrElse("absent")
  }

  private def gatedDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = synchronized {
    val key = GateKey(s, d, docsSig(d))
    gateSlot match {
      case Some((k, df)) if k == key => df
      case prev =>
        val built = documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            TextAnalysis.tokenCount(col("text")).as("ntok"),
            (TextAnalysis.punctCount(col("text")).cast("double") /
              nullif(length(col("text")).cast("long"), lit(0L))).as("pr"),
            TextAnalysis.langId(col("text")).as("lp"),
            TextAnalysis.fingerprint(col("text")).as("fp"))
          .filter(col("ntok").between(10, 1000) &&
            col("pr") <= 0.2 && col("lp") === "en")
          .select("doc_id", "source", "text", "fp")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        prev.foreach { case (_, old) =>
          try old.unpersist(blocking = false)
          catch { case scala.util.control.NonFatal(_) => () } // stopped session
        }
        gateSlot = Some((key, built))
        built
    }
  }

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

  /** Language-score columns (subquery body) + argmax CASE, shared by
    * text_langid and pipeline_quality_gate oracles. */
  private val dLangScores =
    """len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|is|in|that|it|for)\b')) AS s_en,
      |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|est|que|pour)\b')) AS s_fr,
      |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|de|un|una|es|que|por)\b')) AS s_es,
      |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein|eine|zu|den|von)\b')) AS s_de,
      |    greatest(
      |      len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|is|in|that|it|for)\b')),
      |      len(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|est|que|pour)\b')),
      |      len(regexp_extract_all(lower(text), '\b(el|los|las|y|de|un|una|es|que|por)\b')),
      |      len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein|eine|zu|den|von)\b'))) AS best""".stripMargin
  private val dLangCase =
    """CASE
      |    WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
      |    WHEN s_en = best AND best > 0 THEN 'en'
      |    WHEN s_fr = best AND best > 0 THEN 'fr'
      |    WHEN s_es = best AND best > 0 THEN 'es'
      |    WHEN s_de = best AND best > 0 THEN 'de'
      |    ELSE 'und' END""".stripMargin

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
      Some(s"""SELECT doc_id, lang,
              |  $dLangCase AS lang_pred
              |FROM (
              |  SELECT doc_id, lang, text,
              |    $dLangScores
              |  FROM documents) t
              |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d).select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // corpus bigram counts: the n-gram statistics op (top-20, total
    // tiebreak). explode drops sub-2-token docs via the empty array.
    Q("text_ngram_counts",
      Some("""SELECT bigram, count(*) AS cnt FROM (
             |  SELECT unnest(CASE WHEN len(toks) >= 2
             |    THEN list_transform(range(len(toks)-1), i -> toks[i+1] || ' ' || toks[i+2])
             |    ELSE [] END) AS bigram
             |  FROM (SELECT string_split_regex(lower(trim(text)), ' +') AS toks
             |        FROM documents) t) u
             |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin),
      (s, d) => documents(s, d)
        .select(explode(TextAnalysis.bigramsCol(col("text"))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram")).limit(20)),

    // TF-IDF top-3 terms per document. Both engines RANK on the
    // micro-scaled integer (round(tf·ln(N/df)·1e6)), so a last-ulp ln()
    // difference cannot flip the ordering.
    Q("text_tfidf",
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |nq AS (SELECT count(*) AS n FROM documents),
             |s AS (SELECT tf.doc_id, tf.term,
             |        CAST(round(tf.tf * ln(CAST(nq.n AS DOUBLE) / dfq.df) * 1e6) AS BIGINT) AS tfidf_e6
             |      FROM tf JOIN dfq USING (term), nq)
             |SELECT doc_id, term, tfidf_e6,
             |       CAST(row_number() OVER (PARTITION BY doc_id
             |            ORDER BY tfidf_e6 DESC, term) AS BIGINT) AS rn
             |FROM s QUALIFY rn <= 3 ORDER BY doc_id, rn""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = documents(s, d)
        val tf = TokenStats.docTermFreq(docs)
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nq = docs.agg(count(lit(1)).as("n"))
        tf.join(dfq, "term").crossJoin(broadcast(nq))
          .withColumn("tfidf_e6",
            expr("CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 1e6) AS BIGINT)"))
          .withColumn("rn", row_number().over(Window.partitionBy("doc_id")
            .orderBy(col("tfidf_e6").desc, col("term"))).cast("long"))
          .filter(col("rn") <= 3)
          .select("doc_id", "term", "tfidf_e6", "rn")
          .orderBy("doc_id", "rn")
      }),

    // BM25 retrieval: top-20 documents for a fixed 3-term query
    // (k1=1.2, b=0.75, Robertson-Sparck-Jones idf with the +1 floor).
    // Per-(doc,term) scores are µ-rounded FIRST, then summed as BIGINTs
    // per doc — integer addition is associative, so partial+final
    // aggregation order can't perturb the total, and both engines rank
    // on the same exact integer. Scale shape: tf/dl/df are three
    // partial+final aggregations off one token explode; the query-term
    // list and the (n, avgdl) scalars broadcast; top-20 plans as
    // TakeOrderedAndProject — no global sort.
    Q("text_bm25",
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
             |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |nq AS (SELECT count(*) AS n, (SELECT CAST(sum(dl) AS DOUBLE) / count(*) FROM dl) AS avgdl
             |       FROM documents),
             |qt AS (SELECT unnest(['hash', 'merge', 'vector']) AS term),
             |s AS (SELECT tf.doc_id,
             |        CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1)
             |             * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
             |             * 1e6) AS BIGINT) AS e6
             |      FROM tf JOIN qt USING (term) JOIN dfq USING (term)
             |           JOIN dl USING (doc_id), nq)
             |SELECT doc_id, CAST(sum(e6) AS BIGINT) AS bm25_e6 FROM s
             |GROUP BY doc_id ORDER BY bm25_e6 DESC, doc_id LIMIT 20""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val tf = TokenStats.docTermFreq(docs)
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val nq = docs.agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(
            dl.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"))))
        val qt = s.createDataset(Seq("hash", "merge", "vector"))(
          org.apache.spark.sql.Encoders.STRING).toDF("term")
        tf.join(broadcast(qt), "term").join(dfq, "term")
          .join(dl, "doc_id").crossJoin(broadcast(nq))
          .withColumn("e6",
            expr("""CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1)
                   |     * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
                   |     * 1e6) AS BIGINT)""".stripMargin))
          .groupBy("doc_id").agg(sum("e6").as("bm25_e6"))
          .orderBy(col("bm25_e6").desc, col("doc_id")).limit(20)
      }),

    // document chunking: overlapping token windows (size 32, stride 16)
    // — the unit a training pipeline actually feeds a tokenizer. Chunk
    // starts step by the stride until the document is exhausted; the
    // final partial window is kept. posexplode keeps the chunk index.
    Q("text_chunks",
      Some("""SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
             |       array_to_string(toks[ci*16+1 : ci*16+32], ' ') AS chunk_text,
             |       CAST(least(32, len(toks) - ci*16) AS BIGINT) AS n_tokens
             |FROM (SELECT doc_id, string_split_regex(lower(trim(text)), ' +') AS toks
             |      FROM documents) t,
             |     LATERAL unnest(range(CAST(ceil(greatest(len(toks) - 32, 0) / 16.0)
             |                          AS BIGINT) + 1)) u(ci)
             |ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => {
        val toks = split(lower(trim(col("text"))), " +")
        documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"),
            posexplode(TextAnalysis.chunkWindowsCol(col("toks"))))
          .select(col("doc_id"), col("pos").as("chunk_idx"),
            concat_ws(" ", col("col")).as("chunk_text"),
            size(col("col")).cast("long").as("n_tokens"))
          .orderBy("doc_id", "chunk_idx")
      }),

    // sequence packing: per source shard, concatenate documents in
    // doc_id order and cut at a 512-token capacity — each doc lands in
    // bin floor(running prefix / 512) (the contiguous packing real
    // pretraining pipelines use). The running sum is TWO-LEVEL
    // (ScaleRank.partitionedRunningSum): sub-bucketed by
    // floor(doc_id/4096) under (source, bucket) windows + broadcast
    // per-bucket base offsets — a plain per-source window would
    // serialize a 3-source corpus onto 3 tasks at 100 TB. Exact
    // integers; bin ids identical to the single-window spelling.
    Q("text_pack_bins",
      Some("""SELECT doc_id, source, n_tok,
             |       CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin_id,
             |       CAST(cum - n_tok - floor((cum - n_tok) / 512) * 512 AS BIGINT)
             |         AS offset_in_bin
             |FROM (
             |  SELECT doc_id, source,
             |         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text), ' +')) END AS BIGINT) AS n_tok,
             |         sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
             |              ELSE len(string_split_regex(trim(text), ' +')) END AS BIGINT))
             |           OVER (PARTITION BY source ORDER BY doc_id
             |                 ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM documents) t
             |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val base = documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tok"))
        graft.ops.ScaleRank.partitionedRunningSum(base, "source",
            Seq("doc_id"), "n_tok", floor(col("doc_id") / 4096L), "cum")
          .select(col("doc_id"), col("source"), col("n_tok"),
            floor((col("cum") - col("n_tok")) / 512).as("bin_id"),
            (col("cum") - col("n_tok") -
              floor((col("cum") - col("n_tok")) / 512) * 512).as("offset_in_bin"))
          .orderBy("doc_id")
      }),

    // vocabulary build: corpus words with count >= 5, dense ids in
    // (count desc, word) order — the tokenizer-vocab construction pass
    // (explode -> count -> rank). Ids come from ScaleRank's two-phase
    // exact rank, so even a 10⁷-term web-corpus vocabulary never sorts
    // on one partition.
    Q("text_vocab",
      Some("""SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS token_id,
             |       word, cnt FROM (
             |  SELECT word, count(*) AS cnt FROM (
             |    SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS word
             |    FROM documents) t
             |  GROUP BY word HAVING count(*) >= 5) v
             |ORDER BY token_id""".stripMargin),
      (s, d) => {
        // dense ids via ScaleRank (cnt DESC, word): a 100 TB vocabulary
        // is 10⁷+ terms — too big for one ranking partition
        val vocab = TokenStats.docTermFreq(documents(s, d))
          .groupBy(col("term").as("word")).agg(sum("tf").as("cnt"))
          .filter(col("cnt") >= 5)
        graft.ops.ScaleRank.withGlobalRank(vocab, "cnt", "word",
            descending = true, rkName = "token_id")
          .select("token_id", "word", "cnt")
          .orderBy("token_id")
      }),

    // composed quality gate: the keep/drop decision a training-data
    // pipeline actually ships (token-count band + punctuation ceiling +
    // language filter), reusing the scoring + langid operators.
    Q("pipeline_quality_gate",
      Some(s"""SELECT doc_id FROM (
              |  SELECT doc_id, $dLangCase AS lp,
              |         CAST($dTok AS BIGINT) AS ntok,
              |         CAST($dPunct AS DOUBLE) / nullif(length(text), 0) AS pr
              |  FROM (
              |    SELECT doc_id, text,
              |      $dLangScores
              |    FROM documents) t) u
              |WHERE ntok BETWEEN 10 AND 1000 AND pr <= 0.2 AND lp = 'en'
              |ORDER BY doc_id""".stripMargin),
      (s, d) => gatedDocs(s, d).select("doc_id").orderBy("doc_id")),

    // the END-TO-END training-corpus pipeline: quality gate → exact
    // dedup (min-doc_id survivor per fingerprint) → overlapping
    // chunking (32/16) → 512-token sequence packing per source shard —
    // all ONE composed plan. Shuffle ledger: gate is a pure scan, dedup
    // is one shuffle on the 16-byte fingerprint, chunking is
    // shuffle-free row generation, packing is a two-level running sum
    // on (shard, doc-bucket) with broadcast base offsets — parallelism
    // #shards × #buckets, not #shards. Nothing materializes between
    // stages; Catalyst fuses the scan+gate+fingerprint into a single
    // codegen stage.
    Q("pipeline_training_corpus",
      Some(s"""WITH u AS (
              |  SELECT doc_id, source, text, $dLangCase AS lp,
              |         CAST($dTok AS BIGINT) AS ntok,
              |         CAST($dPunct AS DOUBLE) / nullif(length(text), 0) AS pr
              |  FROM (SELECT doc_id, source, text,
              |    $dLangScores
              |  FROM documents) t),
              |kept AS (
              |  SELECT doc_id, source, text,
              |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
              |  FROM u WHERE ntok BETWEEN 10 AND 1000 AND pr <= 0.2 AND lp = 'en'),
              |uniq AS (
              |  SELECT doc_id, source, text FROM (
              |    SELECT doc_id, source, text,
              |           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              |    FROM kept) r WHERE rn = 1),
              |chunks AS (
              |  SELECT doc_id, source, CAST(ci AS INT) AS chunk_idx,
              |         CAST(least(32, len(toks) - ci*16) AS BIGINT) AS n_tokens
              |  FROM (SELECT doc_id, source,
              |               string_split_regex(lower(trim(text)), ' +') AS toks
              |        FROM uniq) t,
              |       LATERAL unnest(range(CAST(ceil(greatest(len(toks) - 32, 0) / 16.0)
              |                            AS BIGINT) + 1)) un(ci)),
              |packed AS (
              |  SELECT doc_id, chunk_idx, source, n_tokens,
              |         sum(n_tokens) OVER (PARTITION BY source
              |                             ORDER BY doc_id, chunk_idx
              |                             ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM chunks)
              |SELECT doc_id, chunk_idx, source, n_tokens,
              |       CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin_id
              |FROM packed ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val kept = gatedDocs(s, d)
        val uniq = kept
          .withColumn("rn",
            row_number().over(Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1)
        val toks = split(lower(trim(col("text"))), " +")
        val chunks = uniq
          .select(col("doc_id"), col("source"), toks.as("toks"))
          .select(col("doc_id"), col("source"),
            posexplode(TextAnalysis.chunkWindowsCol(col("toks"))))
          .select(col("doc_id"), col("source"), col("pos").as("chunk_idx"),
            size(col("col")).cast("long").as("n_tokens"))
        // two-level running sum: bucket by floor(doc_id/4096) — rows of
        // one doc_id share a bucket, so (doc_id, chunk_idx) order within
        // a bucket is the global per-source order restricted to it
        graft.ops.ScaleRank.partitionedRunningSum(chunks, "source",
            Seq("doc_id", "chunk_idx"), "n_tokens",
            floor(col("doc_id") / 4096L), "cum")
          .select(col("doc_id"), col("chunk_idx"), col("source"),
            col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / 512).as("bin_id"))
          .orderBy("doc_id", "chunk_idx")
      }),

    // feature hashing (the hashing trick): tokens bucketed into a
    // fixed 64-dim count vector per document — unbounded vocabulary in,
    // fixed schema out, no vocabulary table to build or broadcast. The
    // bucket hash here is a spellable char-arithmetic one so the oracle
    // recomputes it exactly; production swaps in xxhash64 (same shape,
    // same fixed-width output) where cross-engine equality isn't needed.
    Q("text_feature_hashing",
      Some("""WITH tok AS (SELECT doc_id,
             |          unnest(string_split_regex(lower(trim(text)), ' +')) AS w
             |        FROM documents)
             |SELECT doc_id,
             |       CAST((length(w) * 31 + ord(substring(w, 1, 1)) * 7
             |           + ord(substring(w, length(w), 1)) * 13) % 64 AS BIGINT) AS bucket,
             |       count(*) AS n
             |FROM tok WHERE length(w) > 0
             |GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin),
      (s, d) => documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " +")).as("w"))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"),
          ((length(col("w")) * 31
            + ascii(substring(col("w"), 1, 1)) * 7
            + ascii(expr("substring(w, length(w), 1)")) * 13) % 64)
            .cast("long").as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "bucket")),

    // bigram association strength without logs: the PMI ratio
    // n_ab·N / (n_a·n_b) µ-scaled as exact BIGINT arithmetic —
    // collocation mining whose scores hash-match across engines
    // (log-PMI would rank identically but float-drift the values).
    // Bigram counts and the two unigram legs are all map-side-combined
    // aggregations; the unigram join legs broadcast.
    Q("text_bigram_assoc",
      Some("""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS w
             |            FROM documents),
             |uni AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM uni),
             |bg AS (SELECT unnest(CASE WHEN len(toks) >= 2
             |         THEN list_transform(range(len(toks)-1),
             |              i -> [toks[i+1], toks[i+2]])
             |         ELSE [] END) AS pr
             |       FROM (SELECT string_split_regex(lower(trim(text)), ' +') AS toks
             |             FROM documents) t),
             |bgc AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n_ab
             |        FROM bg GROUP BY 1, 2)
             |SELECT w1, w2, n_ab,
             |       CAST((CAST(n_ab AS HUGEINT) * big_n * 1000000) // (CAST(ua.n AS HUGEINT) * ub.n) AS BIGINT) AS assoc_e6
             |FROM bgc JOIN uni ua ON ua.w = bgc.w1
             |JOIN uni ub ON ub.w = bgc.w2 CROSS JOIN tot
             |WHERE n_ab >= 5
             |ORDER BY w1, w2""".stripMargin),
      (s, d) => {
        val toks = documents(s, d)
          .select(split(lower(trim(col("text"))), " +").as("toks"))
        val uni = toks.select(explode(col("toks")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
        val bgc = toks
          .select(explode(TextAnalysis.bigramPairsCol(col("toks"))).as("pr"))
          .select(col("pr.w1").as("w1"), col("pr.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
        val ua = uni.select(col("w").as("w1"), col("n").as("na"))
        val ub = uni.select(col("w").as("w2"), col("n").as("nb"))
        bgc.filter(col("n_ab") >= 5)
          // the unigram vocabulary grows with the corpus (Heaps'
          // law) — unhinted; AQE broadcasts while it fits
          .join(ua, "w1").join(ub, "w2")
          .crossJoin(broadcast(uni.agg(sum(col("n")).as("big_n"))))
          .select(col("w1"), col("w2"), col("n_ab"),
            // numerator in DECIMAL(38,0)/HUGEINT: at ~2e13 corpus
            // tokens even n_ab = 5 puts n_ab·N·1e6 at 1e20 ≫ 2⁶³ —
            // the same width cliff the r9 audit fixed in
            // feature_scale. The QUOTIENT stays in long range
            // (≤ N·1e6/5 ≈ 4e18 at that N) so the BIGINT result
            // column is safe where the intermediate was not.
            expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * big_n * 1000000)
                   |     DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""
              .stripMargin).as("assoc_e6"))
          .orderBy("w1", "w2")
      }),

    // PII detection + redaction: emails, dashed phone numbers, IPv4
    // addresses found and masked in one scan — the scrub every
    // training corpus runs before anything else sees the text. The
    // pinned corpus is PII-free synthetic prose, so the query first
    // injects deterministic PII-shaped spans DERIVED FROM doc_id
    // (emails on doc_id≡0 mod 3, phone+IP on ≡1, the rest untouched;
    // the oracle builds the identical fixture) — the operator under
    // test is the detect/redact mechanics, which would act on organic
    // text the same way. Patterns use the Java∩RE2 regex subset
    // (classes, bounded repeats, \b) so both engines match the same
    // spans; replacement order (email → phone → IP) is part of the
    // contract since redaction output feeds the next pattern. Pure
    // per-row codegen'd scalar work — no shuffle, no UDF.
    Q("text_pii_redact",
      Some(s"""SELECT doc_id,
              |       CAST(len(regexp_extract_all(aug, '$PiiEmailRe')) AS BIGINT) AS n_emails,
              |       CAST(len(regexp_extract_all(aug, '$PiiPhoneRe')) AS BIGINT) AS n_phones,
              |       CAST(len(regexp_extract_all(aug, '$PiiIpRe')) AS BIGINT) AS n_ips,
              |       regexp_replace(regexp_replace(regexp_replace(aug,
              |         '$PiiEmailRe', '<EMAIL>', 'g'),
              |         '$PiiPhoneRe', '<PHONE>', 'g'),
              |         '$PiiIpRe', '<IP>', 'g') AS redacted
              |FROM ($piiAugSql) ORDER BY doc_id""".stripMargin),
      (s, d) => piiAugmented(documents(s, d)).select(
        col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(PiiEmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("aug"), lit(PiiPhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        size(regexp_extract_all(col("aug"), lit(PiiIpRe), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          PiiEmailRe, "<EMAIL>"),
          PiiPhoneRe, "<PHONE>"),
          PiiIpRe, "<IP>").as("redacted"))
        .orderBy("doc_id")),

    // corpus-level PII incidence: per source shard, how many docs
    // carry each PII class and the overall hit rate (µ-int exact, no
    // float drift). The report a curation run publishes before/after
    // the scrub; one map-side-combined aggregation over the same
    // detection columns as text_pii_redact.
    Q("text_pii_report",
      Some(s"""SELECT source,
              |       CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(sum(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
              |       CAST(sum(ne) AS BIGINT) AS n_emails,
              |       CAST(sum(np) AS BIGINT) AS n_phones,
              |       CAST(sum(ni) AS BIGINT) AS n_ips,
              |       CAST(sum(CASE WHEN ne > 0 OR np > 0 OR ni > 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS pii_rate_e6
              |FROM (SELECT source,
              |        len(regexp_extract_all(aug, '$PiiEmailRe')) AS ne,
              |        len(regexp_extract_all(aug, '$PiiPhoneRe')) AS np,
              |        len(regexp_extract_all(aug, '$PiiIpRe')) AS ni
              |      FROM ($piiAugSql)) t
              |GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => piiAugmented(documents(s, d)).select(
        col("source"),
        size(regexp_extract_all(col("aug"), lit(PiiEmailRe), lit(0)))
          .cast("long").as("ne"),
        size(regexp_extract_all(col("aug"), lit(PiiPhoneRe), lit(0)))
          .cast("long").as("np"),
        size(regexp_extract_all(col("aug"), lit(PiiIpRe), lit(0)))
          .cast("long").as("ni"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ne") > 0 || col("np") > 0 || col("ni") > 0, 1L)
            .otherwise(0L)).as("docs_with_pii"),
          sum("ne").as("n_emails"),
          sum("np").as("n_phones"),
          sum("ni").as("n_ips"))
        .select(col("source"), col("n_docs"), col("docs_with_pii"),
          col("n_emails"), col("n_phones"), col("n_ips"),
          expr("(docs_with_pii * 1000000L) div n_docs").as("pii_rate_e6"))
        .orderBy("source")),

    // N-GRAM repetition signals (Rae et al. 2021, "Scaling Language
    // Models: Methods, Analysis & Insights from Training Gopher",
    // §A1.1: repetitious documents are low-quality): per-doc
    // top-bigram occupancy, top-trigram occupancy, and
    // duplicated-trigram mass, each µ-scaled by exact integer
    // division so both engines hash-match. Complements the WORD-level
    // sibling `text_repetition_score` (Extras6 — dup-word fraction,
    // Simpson concentration, max consecutive run): Gopher's gate uses
    // both families, and the line/paragraph twins are degenerate here
    // (the corpus has no newlines). keep = all three inside the gate —
    // thresholds chosen to split this corpus non-trivially (~66% at
    // every SF). Scale shape: both aggregations are keyed by doc_id
    // (+gram) — group sizes are bounded by DOCUMENT length, not
    // corpus size, so map-side partials absorb the explode and
    // nothing skews; the two signal frames co-shuffle on doc_id for
    // the final join — LEFT from the full doc set, so sub-3-token and
    // null-text docs keep a verdict (null stats = not measured = pass)
    // instead of vanishing from the gate.
    Q("text_repetition_ngram",
      Some("""WITH t AS (SELECT doc_id,
             |            string_split_regex(lower(trim(text)), ' +') AS toks
             |          FROM documents),
             |bg AS (SELECT doc_id, unnest(list_transform(range(len(toks)-1),
             |         i -> toks[i+1] || ' ' || toks[i+2])) AS g FROM t),
             |bgc AS (SELECT doc_id, g, count(*) AS n FROM bg GROUP BY 1, 2),
             |b2 AS (SELECT doc_id,
             |         CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top2_e6
             |       FROM bgc GROUP BY 1),
             |tg AS (SELECT doc_id, unnest(list_transform(range(len(toks)-2),
             |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS g
             |       FROM t),
             |tgc AS (SELECT doc_id, g, count(*) AS n FROM tg GROUP BY 1, 2),
             |t3 AS (SELECT doc_id,
             |         CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top3_e6,
             |         CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000
             |              // sum(n) AS BIGINT) AS dup3_e6
             |       FROM tgc GROUP BY 1)
             |SELECT t.doc_id, top2_e6, top3_e6, dup3_e6,
             |       (coalesce(top2_e6, 0) <= 60000
             |        AND coalesce(top3_e6, 0) <= 30000
             |        AND coalesce(dup3_e6, 0) <= 20000) AS keep
             |FROM t LEFT JOIN b2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = documents(s, d).select(col("doc_id"),
          split(lower(trim(col("text"))), " +").as("toks"))
        val b2 = t.select(col("doc_id"),
            explode(TextAnalysis.bigramPairsCol(col("toks"))).as("pr"))
          .select(col("doc_id"),
            concat_ws(" ", col("pr.w1"), col("pr.w2")).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(expr("CAST((max(n) * 1000000) DIV sum(n) AS BIGINT)")
            .as("top2_e6"))
        val t3 = t.select(col("doc_id"),
            explode(TextAnalysis.trigramsCol(col("toks"))).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(expr("CAST((max(n) * 1000000) DIV sum(n) AS BIGINT)")
            .as("top3_e6"),
            expr("""CAST((sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000)
                   |     DIV sum(n) AS BIGINT)""".stripMargin)
              .as("dup3_e6"))
        // LEFT joins from the full doc set: a doc too short for a gram
        // family (or with null text) must still get a keep verdict — a
        // gate that silently omits documents leaks unscored docs
        // downstream. Missing stats read as zero repetition (pass);
        // the stat columns stay null so "not measured" is visible.
        t.select("doc_id")
          .join(b2, Seq("doc_id"), "left").join(t3, Seq("doc_id"), "left")
          .withColumn("keep", coalesce(col("top2_e6"), lit(0L)) <= 60000 &&
            coalesce(col("top3_e6"), lit(0L)) <= 30000 &&
            coalesce(col("dup3_e6"), lit(0L)) <= 20000)
          .orderBy("doc_id")
      }),

    // DSIR importance weights (Xie et al. 2023, "Data Selection for
    // Language Models via Importance Resampling", NeurIPS — hashed
    // n-gram features, weight = Σ_f n_f(doc)·log(p_target(f)/p_raw(f))):
    // features are word bigrams hashed into 64 buckets with the same
    // arithmetic hash text_feature_hashing ships; the target
    // distribution is the en-labeled slice (the trusted-domain proxy),
    // the proposal is the whole corpus, both Laplace-smoothed over the
    // 64 buckets. Exactness: each log is quantized to µ-units
    // independently (round(ln·1e6) — the agg_entropy idiom) and the
    // per-doc weight is an INTEGER sum of n_b·lr6(b), so accumulation
    // order cannot drift the hash. keep = weight ≥ discrete p75 (the
    // resampling cut; percentile_disc picks a corpus element, no
    // interpolation float). Scale shape: bucket stats are two
    // 64-row aggregates (map-side combined); the per-doc sum joins
    // doc-bucket counts against the 64-row ratio table — broadcast by
    // stats at any corpus size since |buckets| is FIXED; the p75
    // scalar cross-joins as one row. No global sort, no window.
    Q("corpus_dsir_weight",
      Some("""WITH t AS (SELECT doc_id, lang,
             |            string_split_regex(lower(trim(text)), ' +') AS toks
             |          FROM documents),
             |bf AS (SELECT doc_id, lang,
             |         unnest(list_transform(range(len(toks)-1),
             |           i -> toks[i+1] || ' ' || toks[i+2])) AS f FROM t),
             |bb AS (SELECT doc_id, lang,
             |         CAST((length(f) * 31 + ord(substring(f, 1, 1)) * 7
             |             + ord(substring(f, length(f), 1)) * 13) % 64
             |           AS BIGINT) AS bucket
             |       FROM bf),
             |db AS (SELECT doc_id, bucket, count(*) AS n FROM bb GROUP BY 1, 2),
             |raw AS (SELECT bucket, count(*) AS c_r FROM bb GROUP BY 1),
             |tgt AS (SELECT bucket, count(*) AS c_t FROM bb
             |        WHERE lang = 'en' GROUP BY 1),
             |tot AS (SELECT (SELECT sum(c_r) FROM raw) AS big_r,
             |               (SELECT coalesce(sum(c_t), 0) FROM tgt) AS big_t),
             |lr AS (SELECT raw.bucket,
             |         CAST(round(ln(coalesce(tgt.c_t, 0) + 1) * 1e6) AS BIGINT)
             |         - CAST(round(ln(big_t + 64) * 1e6) AS BIGINT)
             |         - CAST(round(ln(raw.c_r + 1) * 1e6) AS BIGINT)
             |         + CAST(round(ln(big_r + 64) * 1e6) AS BIGINT) AS lr6
             |       FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket
             |       CROSS JOIN tot),
             |w AS (SELECT db.doc_id,
             |        CAST(sum(db.n * lr.lr6) AS BIGINT) AS w6
             |      FROM db JOIN lr ON lr.bucket = db.bucket GROUP BY 1),
             |cut AS (SELECT quantile_disc(w6, 0.75) AS p75 FROM w)
             |SELECT doc_id, w6, (w6 >= p75) AS keep
             |FROM w CROSS JOIN cut ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val bb = documents(s, d).select(col("doc_id"), col("lang"),
            explode(TextAnalysis.bigramPairsCol(
              split(lower(trim(col("text"))), " +"))).as("pr"))
          .select(col("doc_id"), col("lang"),
            concat_ws(" ", col("pr.w1"), col("pr.w2")).as("f"))
          .select(col("doc_id"), col("lang"),
            ((length(col("f")) * 31
              + ascii(substring(col("f"), 1, 1)) * 7
              + ascii(expr("substring(f, length(f), 1)")) * 13) % 64)
              .cast("long").as("bucket"))
        // ONE exploded shuffle: doc_id determines lang, so grouping by
        // (doc_id, lang, bucket) has the same cardinality as
        // (doc_id, bucket) — and deriving raw/target bucket stats FROM
        // this frame means the corpus is scanned and exploded ONCE.
        // localCheckpoint (the multi-consumer idiom the banded-pair
        // kernel uses): column pruning specializes each consumer's
        // scan subtree, so ReuseExchange would NOT collapse them —
        // without the cut the three consumers re-scan + re-explode
        // the corpus three times.
        val db2 = bb.groupBy("doc_id", "lang", "bucket")
          .agg(count(lit(1)).as("n")).localCheckpoint()
        val db = db2.select("doc_id", "bucket", "n")
        val raw = db2.groupBy("bucket").agg(sum("n").as("c_r"))
        val tgt = db2.filter(col("lang") === "en")
          .groupBy("bucket").agg(sum("n").as("c_t"))
        val tot = raw.agg(sum("c_r").as("big_r")).crossJoin(
          tgt.agg(coalesce(sum("c_t"), lit(0L)).as("big_t")))
        // 64-row fixed-cardinality frames: broadcast() allowed by the
        // r9 hint policy (|buckets| does not scale with the corpus)
        val lr = raw.join(tgt, Seq("bucket"), "left")
          .crossJoin(broadcast(tot))
          .select(col("bucket"),
            (round(log(coalesce(col("c_t"), lit(0L)) + 1) * 1e6).cast("long")
              - round(log(col("big_t") + 64) * 1e6).cast("long")
              - round(log(col("c_r") + 1) * 1e6).cast("long")
              + round(log(col("big_r") + 64) * 1e6).cast("long")).as("lr6"))
        // w feeds two consumers (the p75 cut and the final projection);
        // checkpoint once so the bucket join + per-doc sum run once
        val w = db.join(broadcast(lr), "bucket")
          .groupBy("doc_id")
          .agg(sum(col("n") * col("lr6")).cast("long").as("w6"))
          .localCheckpoint()
        // exact p75 via ScaleRank's windowless quantile (reduce to the
        // (value, count) table, rank distinct values, integer CDF
        // compare) — percentile_disc's single aggregation buffer holds
        // every value and becomes the one non-distributed piece of
        // this query at billions of docs; semantics are identical
        // (smallest value with CDF ≥ 3/4)
        val cut = graft.ops.ScaleRank.exactQuantilesDisc(
          w, "w6", Seq(3 -> 4), Seq("p75"))
        w.crossJoin(broadcast(cut))
          .select(col("doc_id"), col("w6"), (col("w6") >= col("p75")).as("keep"))
          .orderBy("doc_id")
      }),

    // corpus mix apportionment — the integer sampling quotas every
    // multi-source training mix needs (The Pile / DoReMi-style source
    // mixing): split a budget of N=1000 sample slots across sources
    // proportionally to their doc counts with Hamilton's
    // largest-remainder method, the classic exact-sum apportionment
    // (floors alone under-fill the budget; naive rounding drifts it).
    // base_i = (N·c_i) DIV C, then the N − Σbase deficit goes to the
    // largest remainders (ties → source asc). Exact integers end to
    // end, so Σ quota = N by construction in both engines. Scale
    // shape: one per-source count aggregation (map-side combined);
    // the apportionment itself — including its global rank window —
    // runs on the |sources|-row aggregate, bounded by source
    // cardinality, never the corpus.
    Q("corpus_mix_apportion",
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |t AS (SELECT sum(n) AS ct FROM c),
             |b AS (SELECT source, n, (1000 * n) // ct AS base,
             |             (1000 * n) % ct AS rem
             |      FROM c, t),
             |d AS (SELECT 1000 - sum(base) AS def FROM b),
             |r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source) AS rk
             |      FROM b)
             |SELECT source, CAST(n AS BIGINT) AS n_docs,
             |       CAST(base + CASE WHEN rk <= d.def THEN 1 ELSE 0 END AS BIGINT)
             |         AS quota
             |FROM r, d ORDER BY source""".stripMargin),
      (s, d) => {
        val c = documents(s, d).groupBy("source").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("ct"))
        val b = c.crossJoin(broadcast(t))
          .select(col("source"), col("n"),
            expr("(1000 * n) DIV ct").as("base"),
            expr("(1000 * n) % ct").as("rem"))
        val dft = b.agg((lit(1000L) - sum("base")).as("def"))
        // global rank over the |sources|-row aggregate only (bounded
        // by source cardinality, never the corpus). asc_nulls_last on
        // the tiebreak: Spark's asc default is NULLS FIRST, DuckDB's
        // is NULLS LAST — a null source group with a tied remainder
        // would get a different rank (and quota) across engines under
        // the defaults (no null sources in testdata; the pin is for
        // corpora that have them)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("source").asc_nulls_last)
        b.withColumn("rk", row_number().over(w))
          .crossJoin(broadcast(dft))
          .select(col("source"), col("n").as("n_docs"),
            (col("base") + when(col("rk") <= col("def"), 1L).otherwise(0L))
              .cast("long").as("quota"))
          .orderBy("source")
      }),

    // the apportionment's CONSUMER: a deterministic stratified sample —
    // within each source, take that source's Hamilton quota of docs
    // ranked by md5(doc_id) (a uniform, engine-portable, seedless
    // shuffle order; doc_id unique → no ties). Together with
    // corpus_mix_apportion this is the complete mix-sampling pair every
    // multi-source training corpus build runs. Sources smaller than
    // their quota contribute everything they have (rank filter caps at
    // the stratum size — at sf0.001 the 1000-slot budget exceeds the
    // 500-doc corpus, so the sample IS the corpus there). Scale shape:
    // quotas broadcast (|sources| rows); the per-source rank is a
    // source-partitioned window pruned by a LITERAL rk <= budget
    // filter that plans a WindowGroupLimit (per-stratum top-N below
    // the window — only literal bounds do; the column-bound quota
    // filter alone would buffer whole strata), then the quota filter
    // trims within the budget-bounded survivors.
    Q("corpus_stratified_sample",
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |t AS (SELECT sum(n) AS ct FROM c),
             |b AS (SELECT source, n, (1000 * n) // ct AS base,
             |             (1000 * n) % ct AS rem
             |      FROM c, t),
             |d AS (SELECT 1000 - sum(base) AS def FROM b),
             |qt AS (SELECT source,
             |         base + CASE WHEN row_number() OVER
             |           (ORDER BY rem DESC, source) <= d.def
             |           THEN 1 ELSE 0 END AS quota
             |       FROM b, d),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source
             |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |      FROM documents)
             |SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
             |FROM r JOIN qt USING (source)
             |WHERE r.rk <= qt.quota
             |ORDER BY r.source, r.rk""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("ct"))
        val b = c.crossJoin(broadcast(t))
          .select(col("source"), col("n"),
            expr("(1000 * n) DIV ct").as("base"),
            expr("(1000 * n) % ct").as("rem"))
        val dft = b.agg((lit(1000L) - sum("base")).as("def"))
        val wq = org.apache.spark.sql.expressions.Window
          .orderBy(col("rem").desc, col("source").asc_nulls_last)
        val quotas = b.withColumn("rk", row_number().over(wq))
          .crossJoin(broadcast(dft))
          .select(col("source"),
            (col("base") + when(col("rk") <= col("def"), 1L).otherwise(0L))
              .as("quota"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.select(col("doc_id"), col("source"))
          .withColumn("rk", row_number().over(wr).cast("long"))
          // the budget bounds every quota, so rk ≤ 1000 is implied —
          // stated as a LITERAL because only a literal rank bound
          // plans a WindowGroupLimit (per-stratum top-N pruning below
          // the window); the column-bound quota filter alone buffers
          // whole strata
          .filter(col("rk") <= 1000L)
          .join(broadcast(quotas), "source")
          .filter(col("rk") <= col("quota"))
          .select("doc_id", "source", "rk")
          .orderBy("source", "rk")
      }),

    // BPE merge LEARNING (Sennrich et al. 2016) — distributed
    // tokenizer training; see graft.text.Bpe for algorithm + scale
    // shape. Part 1 = the 4-merge table (rank, "l+r", weighted pair
    // count), part 2 = the top-20 resulting corpus symbols, so the
    // gate checks both the LEARNED ranks and the APPLIED merges. The
    // oracle spells greedy non-overlapping application INDEPENDENTLY
    // (match runs + parity, vs the engine's left fold) — a
    // cross-check of the semantics, not a shared formula. The chained
    // per-iteration CTEs are MATERIALIZED: without it DuckDB inlines
    // each t{k} into its two consumers and the corpus scan re-runs
    // 2^k times (measured 29 s → 1.05 s at sf0.01).
    Q("text_bpe_merges",
      Some(bpeOracle(4)),
      (s, d) => Bpe.bpeReport(documents(s, d), 4)),

    // Applying the learned tokenizer to the corpus: per-document word/
    // char/BPE-token counts + µ-rounded compression ratio — the
    // tokenizer-budget artifact sequence packing and context-window
    // pricing read. The corpus encode is ONE join of document tokens
    // against the |vocab|-row merged word-type map (merges never
    // re-apply per occurrence); the oracle renders the SAME learning
    // chain (bpeChainCtes) and re-derives every per-doc count.
    Q("text_bpe_encode",
      Some(bpeEncodeOracle(4)),
      (s, d) => Bpe.encodeReport(documents(s, d), 4)),

    // Interpolated Kneser-Ney bigram LM score per document (Kneser &
    // Ney 1995; Chen & Goodman 1998's interpolated form with a fixed
    // absolute discount D = 0.75) — the smoothing class behind
    // KenLM-style CCNet perplexity filtering, upgrading
    // text_bigram_lm's add-1: P(w2|w1) = (c(w1w2) − D + D·N1+(w1·)·
    // Pcont(w2)) / c(w1·), Pcont(w2) = N1+(·w2)/|bigram types|. Only
    // OBSERVED bigrams are scored (c ≥ 1, so the max(c−D, 0) clamp
    // never binds — same instance-join shape as text_bigram_lm); all
    // statistics are exact integers off ONE bigram-count relation
    // (map-side combinable), D = 0.75 is exact in binary, and the one
    // ln term per instance is µ-rounded before the associative BIGINT
    // sum. The arithmetic spelling is character-identical in both
    // engines so the IEEE evaluation order cannot diverge.
    Q("text_bigram_kn",
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
             |ftot AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS tot,
             |                CAST(count(*) AS BIGINT) AS n1p
             |         FROM bgc GROUP BY 1),
             |lcnt AS (SELECT w2, CAST(count(*) AS BIGINT) AS lcont
             |         FROM bgc GROUP BY 1),
             |tq AS (SELECT CAST(count(*) AS BIGINT) AS t FROM bgc)
             |SELECT bgd.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |       CAST(sum(CAST(round(ln((n_ab - 0.75 + 0.75 * n1p
             |            * (CAST(lcont AS DOUBLE) / t)) / tot) * 1e6) AS BIGINT))
             |         AS BIGINT) AS kn_e6
             |FROM bgd JOIN bgc USING (w1, w2)
             |         JOIN ftot USING (w1)
             |         JOIN lcnt USING (w2)
             |         CROSS JOIN tq
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      (s, d) => TextAnalysis.knBigramReport(documents(s, d)))
  )

  /** DuckDB oracle renderer for text_bpe_merges: one CTE block per
    * learning iteration (pair counts → 1-row argmax → match runs →
    * every-other-chosen → rebuilt symbol arrays), chained t0 → tN. */
  private def bpeIterCtes(k: Int): String = {
    val prev = s"t${k - 1}"
    s"""p$k AS MATERIALIZED (SELECT w, f, i, syms[i] AS l, syms[i+1] AS r
       |         FROM $prev, LATERAL unnest(range(1, len(syms))) u(i)),
       |b$k AS MATERIALIZED (SELECT l, r, n FROM (
       |         SELECT l, r, CAST(sum(f) AS BIGINT) AS n FROM p$k
       |         GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1)),
       |m$k AS (SELECT p$k.w, p$k.i FROM p$k JOIN b$k
       |         ON p$k.l = b$k.l AND p$k.r = b$k.r),
       |c$k AS MATERIALIZED (SELECT w, i FROM (
       |           SELECT w, i, row_number() OVER (PARTITION BY w, i - rn ORDER BY i) AS o
       |           FROM (SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) AS rn
       |                 FROM m$k))
       |         WHERE o % 2 = 1),
       |t$k AS MATERIALIZED (SELECT p.w, p.f,
       |           list(CASE WHEN c.i IS NOT NULL THEN p.sym || p.nxt ELSE p.sym END
       |                ORDER BY p.i) AS syms
       |         FROM (SELECT w, f, i, syms[i] AS sym, syms[i+1] AS nxt
       |               FROM $prev, LATERAL unnest(range(1, len(syms)+1)) u(i)) p
       |         LEFT JOIN c$k c ON c.w = p.w AND c.i = p.i
       |         LEFT JOIN c$k cp ON cp.w = p.w AND cp.i = p.i - 1
       |         WHERE cp.i IS NULL
       |         GROUP BY p.w, p.f)""".stripMargin
  }

  /** The learning-chain CTEs (word types → char symbols → n merge
    * iterations) — the ONE spelling both BPE oracles render. */
  private def bpeChainCtes(n: Int): String =
    s"""wf AS MATERIALIZED (SELECT w, count(*) AS f
       |  FROM (SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS w
       |        FROM documents) t
       |  WHERE len(w) > 0 GROUP BY w),
       |t0 AS MATERIALIZED (SELECT w, f,
       |         list_transform(range(1, len(w)+1), i -> substring(w, i, 1)) AS syms
       |       FROM wf),
       |${(1 to n).map(bpeIterCtes).mkString(",\n")}""".stripMargin

  private def bpeOracle(n: Int): String = {
    val part1 = (1 to n).map(k =>
      s"""SELECT CAST(1 AS BIGINT) AS part, CAST($k AS BIGINT) AS rank,
         |       l || '+' || r AS sym, n FROM b$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeChainCtes(n)}
       |SELECT part, rank, sym, n FROM (
       |$part1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), CAST(row_number() OVER (ORDER BY n DESC, sym) AS BIGINT),
       |       sym, n
       |FROM (SELECT sym, CAST(sum(f) AS BIGINT) AS n
       |      FROM (SELECT f, unnest(syms) AS sym FROM t$n) GROUP BY sym
       |      ORDER BY n DESC, sym LIMIT 20))
       |ORDER BY part, rank""".stripMargin
  }

  private def bpeEncodeOracle(n: Int): String =
    s"""WITH ${bpeChainCtes(n)},
       |tok AS (SELECT doc_id, w FROM (
       |          SELECT doc_id,
       |                 unnest(string_split_regex(lower(trim(text)), ' +')) AS w
       |          FROM documents) t
       |        WHERE len(w) > 0),
       |sz AS (SELECT w, len(w) AS nc, len(syms) AS nt FROM t$n)
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(nc) AS BIGINT) AS n_chars,
       |       CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
       |       CAST(round(CAST(sum(nt) AS DOUBLE) / sum(nc) * 1e6) AS BIGINT)
       |         AS compression_e6
       |FROM tok JOIN sz USING (w)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** Java∩RE2 PII patterns (shared verbatim by both engines): no
    * backrefs, no lookaround, only classes/bounded repeats/\b — the
    * subset where java.util.regex and RE2 agree on every span. */
  private val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiPhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  private val PiiIpRe =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** The deterministic PII fixture, DuckDB spelling (subquery body):
    * doc_id≡0 (mod 3) gains an email, ≡1 gains a phone + an IPv4,
    * ≡2 stays clean. Escaped \\. in the patterns above survive the
    * SQL string literal because DuckDB strings are not
    * backslash-processed. NOTE: this body is interpolated into query
    * strings that apply their OWN stripMargin, so no line here may
    * begin with `|` — a line-leading `||` concat would lose a pipe
    * and bind as bitwise-or (hence the trailing-|| line breaks). */
  private def piiAugSql: String =
    """SELECT doc_id, source,
      |  CASE WHEN doc_id % 3 = 0
      |       THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex-mail.org now'
      |       WHEN doc_id % 3 = 1
      |       THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |            ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.99'
      |       ELSE text END AS aug
      |FROM documents""".stripMargin

  /** The same fixture, Spark spelling. */
  private def piiAugmented(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact u"),
          col("doc_id").cast("string"), lit("@ex-mail.org now")))
        .when(col("doc_id") % 3 === 1,
          concat(col("text"), lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0.99")))
        .otherwise(col("text")).as("aug"))
}
