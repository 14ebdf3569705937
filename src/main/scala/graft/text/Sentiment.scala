package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** X3 — per-row sentiment enrichment (reference etl_core.py:36-60).
  *
  * The reference calls AWS Comprehend `detect_sentiment` once per row,
  * serially, over HTTPS — its scalability cliff (etl_core.py:42-46,60).
  * This engine keeps the exact label contract:
  *   - null / blank text → "NEUTRAL"            (etl_core.py:38-39)
  *   - input truncated to 4900 chars            (etl_core.py:43)
  *   - labels ∈ {POSITIVE, NEGATIVE, NEUTRAL, MIXED}   (Comprehend set)
  *   - any failure → "ERROR" sentinel           (etl_core.py:47-49)
  *
  * and replaces the external model with a deterministic lexicon scorer
  * (zero egress). Two implementations:
  *
  *  1. [[sentimentCol]] — pure Column composition (regexp match counts).
  *     Codegen'd, no UDF, used by all registered queries; also exactly
  *     expressible in the DuckDB oracle SQL.
  *  2. [[enrichBatched]] — the external-service shape: mapPartitions with
  *     batched calls through a pluggable client, the idiom a live
  *     Comprehend/LLM endpoint needs at scale (one RPC per batch per
  *     partition instead of per row). Ships with the lexicon client;
  *     unit-tested including the ERROR sentinel path.
  */
object Sentiment {
  val MaxChars = 4900

  /** Lexicon chosen to intersect the testdata vocabulary so scores are
    * non-trivial on /root/testdata documents. */
  val PositivePattern = "\\b(fast|clean|good|great|best|win)\\b"
  val NegativePattern = "\\b(slow|dup|bad|error|worst|broken)\\b"

  private def matches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** Pure-Column sentiment with the reference's label contract. */
  def sentimentCol(text: Column): Column = {
    val t = lower(substring(text, 1, MaxChars))
    val p = matches(t, PositivePattern)
    val n = matches(t, NegativePattern)
    when(text.isNull || trim(text) === "", "NEUTRAL")
      .when(p > n, "POSITIVE")
      .when(n > p, "NEGATIVE")
      .when(p > 0, "MIXED")
      .otherwise("NEUTRAL")
  }

  /** Scala-side scorer, shared by the batched client and the tests.
    * Derived from the SAME pattern constants as [[sentimentCol]] and
    * [[oracleCaseSql]] — the lexicon exists once; a re-typed copy here
    * previously meant an edit to one spelling silently split the three
    * paths. */
  private val posRe = PositivePattern.r
  private val negRe = NegativePattern.r
  def score(text: String): String = {
    if (text == null || text.trim.isEmpty) "NEUTRAL"
    else {
      // truncate on CODEPOINTS (and never mid-surrogate) to match
      // Spark/DuckDB substring semantics — Java substring counts
      // UTF-16 units, which cuts astral-character texts earlier than
      // the Column path and can split an emoji in half. ROOT-locale
      // lowercase: a tr-TR default JVM folds I to dotless ı, which the
      // \bwin\b class never matches, silently flipping labels vs the
      // oracle.
      val cut =
        if (text.codePointCount(0, text.length) <= MaxChars) text
        else text.substring(0, text.offsetByCodePoints(0, MaxChars))
      val t = cut.toLowerCase(java.util.Locale.ROOT)
      val p = posRe.findAllMatchIn(t).size
      val n = negRe.findAllMatchIn(t).size
      if (p > n) "POSITIVE"
      else if (n > p) "NEGATIVE"
      else if (p > 0) "MIXED"
      else "NEUTRAL"
    }
  }

  /** External-enrichment client contract: one call per BATCH (the shape
    * Comprehend's BatchDetectSentiment / any LLM endpoint wants), built
    * fresh per partition (never serialized from the driver). */
  trait SentimentClient extends Serializable {
    def detectBatch(texts: Seq[String]): Seq[String]
  }

  /** Deterministic zero-egress client. */
  object LexiconClient extends SentimentClient {
    def detectBatch(texts: Seq[String]): Seq[String] = texts.map(score)
  }

  /** The scalable external-call operator: batches rows inside each
    * partition and calls the client once per batch. Any batch failure
    * maps that batch's rows to "ERROR" (reference etl_core.py:47-49) —
    * the job keeps going, mirroring the reference's per-row try/except.
    */
  def enrichBatched(
      df: DataFrame,
      textCol: String,
      outCol: String,
      client: SentimentClient = LexiconClient,
      batchSize: Int = 25): DataFrame = {
    val schema = df.schema.add(outCol, org.apache.spark.sql.types.StringType)
    val enc = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(idx)) null else r.getString(idx))
        // NonFatal only: OOM / task-kill interrupts must propagate,
        // not be persisted as "ERROR" data labels on a task that then
        // refuses to die. A client answering with the WRONG number of
        // labels is also a batch failure (zip would silently DROP the
        // unmatched rows — a vanished input row, the worst outcome for
        // an enrichment operator), mapped to ERROR like the reference's
        // per-row except.
        val labels =
          try {
            val ls = client.detectBatch(texts)
            if (ls.size == texts.size) ls
            else {
              System.err.println(s"[sentiment] client returned ${ls.size} " +
                s"labels for ${texts.size} texts — batch marked ERROR")
              texts.map(_ => "ERROR")
            }
          }
          catch { case scala.util.control.NonFatal(_) => texts.map(_ => "ERROR") }
        batch.zip(labels).map { case (r, label) =>
          Row.fromSeq(r.toSeq :+ label)
        }
      }
    }(enc)
  }

  /** The DuckDB-oracle SQL equivalent of [[sentimentCol]] applied to a
    * column named `text` (kept here so Spark + oracle stay in sync). */
  def oracleCaseSql(textExpr: String): String = {
    val t = s"lower(substring($textExpr, 1, $MaxChars))"
    val p = s"len(regexp_extract_all($t, '$PositivePattern'))"
    val n = s"len(regexp_extract_all($t, '$NegativePattern'))"
    s"""CASE WHEN $textExpr IS NULL OR trim($textExpr) = '' THEN 'NEUTRAL'
        WHEN $p > $n THEN 'POSITIVE'
        WHEN $n > $p THEN 'NEGATIVE'
        WHEN $p > 0 THEN 'MIXED'
        ELSE 'NEUTRAL' END"""
  }
}
