package graft

import org.apache.spark.sql.functions._

/** LLM-corpus prep operators: chunking / packing / vocab invariants
  * beyond the DuckDB oracle (structural properties per document). */
class TextPrepSpec extends SparkSpec {

  test("text_chunks: stride/coverage invariants per document") {
    val chunks = Registry.all.find(_.name == "text_chunks").get
      .fn(spark, sf0001)
    val docs = io.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), " +")).as("ntok"))
    val per = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_tokens") === 32, 1).otherwise(0)).as("n_full"),
        max(col("n_tokens")).as("max_t"), min(col("n_tokens")).as("min_t"))
      .join(docs, "doc_id")
    // every doc chunked; expected chunk count = ceil(max(ntok-32,0)/16)+1
    assert(per.count() == docs.count())
    val bad = per.filter(
      col("n_chunks") =!= (ceil(greatest(col("ntok") - 32, lit(0)) / 16.0) + 1) ||
        col("max_t") > 32 || col("min_t") < 1)
    assert(bad.count() == 0, bad.limit(5).collect().mkString("; "))
  }

  test("text_pack_bins: offsets stay under capacity and bins advance monotonically") {
    val bins = Registry.all.find(_.name == "text_pack_bins").get
      .fn(spark, sf0001)
    assert(bins.filter(col("offset_in_bin") < 0 || col("offset_in_bin") >= 512)
      .count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val nonMono = bins
      .withColumn("prev_bin", lag(col("bin_id"), 1).over(w))
      .filter(col("prev_bin").isNotNull && col("bin_id") < col("prev_bin"))
    assert(nonMono.count() == 0)
  }

  test("text_vocab: dense contiguous ids, min-count filter, rank order") {
    val v = Registry.all.find(_.name == "text_vocab").get
      .fn(spark, sf0001).collect()
    assert(v.map(_.getLong(0)).toSeq == (1L to v.length).toSeq)
    assert(v.forall(_.getLong(2) >= 5))
    // counts non-increasing in id order; ties broken by word ascending
    v.sliding(2).foreach { case Array(a, b) =>
      val (ca, cb) = (a.getLong(2), b.getLong(2))
      assert(ca > cb || (ca == cb && a.getString(1) < b.getString(1)))
    case _ => ()
    }
  }

  test("text_pii_redact: redaction is complete, counted, and clean-doc-preserving") {
    val red = Registry.all.find(_.name == "text_pii_redact").get
      .fn(spark, sf0001)
    // the fixture plants exactly one email on doc_id≡0 (mod 3), one
    // phone + one IP on ≡1, nothing on ≡2 — counts must match it
    val wrongCounts = red.filter(
      when(col("doc_id") % 3 === 0,
        col("n_emails") =!= 1 || col("n_phones") =!= 0 || col("n_ips") =!= 0)
        .when(col("doc_id") % 3 === 1,
          col("n_emails") =!= 0 || col("n_phones") =!= 1 || col("n_ips") =!= 1)
        .otherwise(col("n_emails") + col("n_phones") + col("n_ips") =!= 0))
    assert(wrongCounts.count() == 0,
      wrongCounts.limit(5).collect().mkString("; "))
    // post-redaction text must carry ZERO residual matches of any
    // pattern (the whole point of the scrub) and the placeholder
    // exactly where a span was found
    val residual = red.filter(
      size(regexp_extract_all(col("redacted"),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit("\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"),
        lit("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"),
        lit(0))) > 0)
    assert(residual.count() == 0)
    val misplaced = red.filter(
      (col("n_emails") > 0) =!= col("redacted").contains("<EMAIL>") ||
        (col("n_phones") > 0) =!= col("redacted").contains("<PHONE>") ||
        (col("n_ips") > 0) =!= col("redacted").contains("<IP>"))
    assert(misplaced.count() == 0)
    // clean docs pass through BYTE-identical (redaction must never
    // touch non-PII text)
    val docs = io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val mutated = red.filter(col("doc_id") % 3 === 2).join(docs, "doc_id")
      .filter(col("redacted") =!= col("text"))
    assert(mutated.count() == 0)
  }

  test("text_repetition_ngram: hand-computed signals on constructed docs") {
    import spark.implicits._
    // doc 0: "a b" × 4 — bigrams ab×4 ba×3 (top 4/7), trigrams aba×3
    // bab×3 (top 3/6, dup mass 6/6) → repetitious.
    // doc 1: 20 distinct words — every bigram unique (top 1/19),
    // every trigram unique (top 1/18, dup mass 0) → clean.
    val docs = Seq(
      (0L, "a b a b a b a b"),
      (1L, (0 until 20).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    // the registered fn reads the real corpus; the fixture pins the
    // signal math through the SAME shared helpers + integer spellings:
    val t = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), " +").as("toks"))
    val b2 = t.select(col("doc_id"),
        explode(text.TextAnalysis.bigramPairsCol(col("toks"))).as("pr"))
      .select(col("doc_id"), concat_ws(" ", col("pr.w1"), col("pr.w2")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(expr("CAST((max(n) * 1000000) DIV sum(n) AS BIGINT)").as("top2_e6"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b2 == Map(0L -> 571428L, 1L -> 52631L), b2)
    val t3 = t.select(col("doc_id"),
        explode(text.TextAnalysis.trigramsCol(col("toks"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(expr("CAST((max(n) * 1000000) DIV sum(n) AS BIGINT)").as("top3_e6"),
        expr("""CAST((sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000)
               |     DIV sum(n) AS BIGINT)""".stripMargin).as("dup3_e6"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t3 == Map(0L -> (500000L, 1000000L), 1L -> (55555L, 0L)), t3)
    // trigram guard: a 2-token doc yields an EMPTY array, not a
    // descending sequence()
    val twoTok = Seq((9L, "x y")).toDF("doc_id", "text")
      .select(size(text.TextAnalysis.trigramsCol(
        split(col("text"), " "))).as("n")).collect()
    assert(twoTok.head.getInt(0) == 0)
    // registered query on the real corpus: keep ⟺ all three gates,
    // and the gate splits the corpus non-trivially
    val out = text.TextQueries.queries.find(_.name == "text_repetition_ngram")
      .get.fn(spark, sf0001).cache()
    val bad = out.filter(col("keep") =!=
      (col("top2_e6") <= 60000 && col("top3_e6") <= 30000 &&
        col("dup3_e6") <= 20000))
    assert(bad.count() == 0)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < out.count(), s"kept=$kept")
    out.unpersist()
  }

  test("corpus_dsir_weight: target-like content outranks off-target " +
      "regardless of its own label") {
    val out = Registry.all.find(_.name == "corpus_dsir_weight").get
      .fn(spark, sf0001).cache()
    // every doc scored exactly once, keep is the p75 cut (≥ 25% kept,
    // and keep ⟺ w6 ≥ min kept weight)
    val n = out.count()
    assert(n == io.Tables.documents(spark, sf0001).count())
    val kept = out.filter(col("keep")).count()
    assert(kept >= n / 4 && kept < n, s"kept=$kept n=$n")
    val minKept = out.filter(col("keep")).agg(min("w6")).head().getLong(0)
    assert(out.filter(!col("keep") && col("w6") >= minKept).count() == 0)
    // content-based, not label-based: en docs' MEAN weight exceeds the
    // non-en mean (the en slice defines the target distribution, so
    // its own n-gram mass must score above the proposal average)
    val docs = io.Tables.documents(spark, sf0001).select("doc_id", "lang")
    val means = out.join(docs, "doc_id").groupBy(col("lang") === "en")
      .agg(avg("w6")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false), means)
    out.unpersist()
  }

  test("corpus_mix_apportion: quotas are the exact Hamilton apportionment " +
      "and sum to the budget") {
    val out = SparkEntry.queries("corpus_mix_apportion")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent reference: recompute largest-remainder quotas in
    // plain Scala from the same counts and compare EXACTLY
    val counts = out.map { case (s, n, _) => s -> n }
    val total = counts.map(_._2).sum
    val base = counts.map { case (s, n) =>
      (s, 1000L * n / total, 1000L * n % total) }
    val deficit = (1000L - base.map(_._2).sum).toInt
    val bump = base.sortBy { case (s, _, rem) => (-rem, s) }
      .take(deficit).map(_._1).toSet
    val expected = base.map { case (s, b, _) =>
      s -> (b + (if (bump(s)) 1 else 0)) }.toMap
    assert(out.map(_._3).sum == 1000L, out.toSeq)
    out.foreach { case (s, _, q) =>
      assert(q == expected(s), s"$s: got $q want ${expected(s)}") }
  }

  test("corpus_stratified_sample: per-source size = min(quota, stratum), " +
      "ranks contiguous, repeat-run deterministic") {
    val quotas = SparkEntry.queries("corpus_mix_apportion")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sample = SparkEntry.queries("corpus_stratified_sample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = sample.groupBy(_._2)
    quotas.foreach { case (s, n, q) =>
      assert(bySource.get(s).map(_.length.toLong).getOrElse(0L) ==
        math.min(n, q), s"$s: quota $q of $n docs") }
    bySource.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) }
    // seedless determinism: a second run yields the identical id set
    val again = SparkEntry.queries("corpus_stratified_sample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == sample.toSet)
  }

  test("text_bigram_kn: hand-built corpus matches the closed form") {
    import spark.implicits._
    // corpus "a b a b a c": bigrams (a,b)×2 (b,a)×2 (a,c)×1.
    // tot(a)=3 n1p(a)=2; tot(b)=2 n1p(b)=1; lcont(b)=1 lcont(a)=1
    // lcont(c)=1; T=3 bigram types.
    val docs = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    def term(nAb: Long, n1p: Long, lcont: Long, t: Long, tot: Long): Long =
      Math.round(Math.log(
        (nAb - 0.75 + 0.75 * n1p * (lcont.toDouble / t)) / tot) * 1e6)
    val expected = 2 * term(2, 2, 1, 3, 3) + // (a,b): P = (1.25+0.5)/3
      2 * term(2, 1, 1, 3, 2) +              // (b,a): P = (1.25+0.25)/2
      term(1, 2, 1, 3, 3)                    // (a,c): P = (0.25+0.5)/3
    val got = graft.text.TextAnalysis.knBigramReport(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 5L, expected)))
  }
}
