package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-5 operators beyond the DuckDB hash
  * gate: EWMA recurrence exactness, winsorize clamp bounds, BM25
  * monotonicity in tf, simhash/SRP signature shape and determinism,
  * and line-dedup conservation.
  */
class Extras8Spec extends SparkSpec {

  test("window_ewma equals a scala recompute of the 8-deep halving fold") {
    import spark.implicits._
    val got = SparkEntry.queries("window_ewma")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ev = graft.io.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.getTime, r._2))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 7), i + 1).map(_._4)
        val folded = frame.tail.foldLeft(frame.head)((a, x) => 0.5 * a + 0.5 * x)
        val r = ordered(i)
        assert(got((r._1, r._2)) == math.round(folded * 1e6),
          s"user=${r._1} event=${r._2}")
      }
    }
  }

  test("winsorize clamps into [p05, p95] and flags exactly the out-of-range rows") {
    import spark.implicits._
    val got = SparkEntry.queries("feature_winsorize")(spark, sf0001)
      .as[(Long, String, Long, Boolean)].collect()
    val vals = graft.io.Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val byType = vals.groupBy(_._2).map { case (t, rs) =>
      val sorted = rs.map(_._3).sorted
      // percentile_disc: smallest value at cumulative fraction >= p
      def disc(p: Double) = sorted((p * sorted.length).ceil.toInt.max(1) - 1)
      t -> (disc(0.05), disc(0.95))
    }
    val rawById = vals.map(r => r._1 -> r._3).toMap
    got.foreach { case (id, t, v6, clipped) =>
      val (lo, hi) = byType(t)
      val raw = rawById(id)
      assert(v6 == math.round(math.min(math.max(raw, lo), hi) * 1e6), s"id=$id")
      assert(clipped == (raw < lo || raw > hi), s"id=$id clip flag")
    }
  }

  test("bm25: adding an occurrence of a query term never lowers a doc's score") {
    def score(tf: Int, dl: Int, df: Int, n: Int, avgdl: Double): Double = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
      idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    }
    val s1 = score(tf = 1, dl = 3, df = 2, n = 4, avgdl = 3.25)
    val s2 = score(tf = 2, dl = 4, df = 2, n = 4, avgdl = 3.25)
    assert(s2 > s1, "tf monotonicity (per-term, dl-adjusted)")
  }

  test("bm25 registered query returns 20 ranked rows with distinct docs") {
    val got = SparkEntry.queries("text_bm25")(spark, sf0001).collect()
    assert(got.length == 20)
    val scores = got.map(_.getLong(1))
    assert(scores.sameElements(scores.sortBy(-_: Long)), "descending scores")
    assert(got.map(_.getLong(0)).distinct.length == 20, "distinct docs")
  }

  test("md5 simhash is 16 lowercase hex chars, bucket is its prefix, near-dup texts collide") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // 1 token differs
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val fp = graft.text.Dedup.simHashMd5(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    fp.values.foreach { h =>
      assert(h.length == 16 && h.forall("0123456789abcdef".contains(_)), h)
    }
    def bitsOf(h: String): Seq[Int] = h.flatMap { c =>
      val v = Integer.parseInt(c.toString, 16)
      Seq((v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1)
    }
    val d12 = bitsOf(fp(1L)).zip(bitsOf(fp(2L))).count(p => p._1 != p._2)
    val d13 = bitsOf(fp(1L)).zip(bitsOf(fp(3L))).count(p => p._1 != p._2)
    assert(d12 < d13, s"near-dup hamming $d12 should undercut unrelated $d13")
    assert(d12 <= 16, "7/8 shared tokens stay within a small hamming ball")
  }

  test("dedup_lines: kept <= total, all blocks kept when no cross-doc dup, totals conserve") {
    import spark.implicits._
    val got = SparkEntry.queries("dedup_lines")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, kept) =>
      assert(kept >= 0 && kept <= n, s"doc=$id")
    }
    // every block text belongs to exactly one keeper across the corpus:
    // sum(kept) == number of distinct block texts.
    val docs = graft.io.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(lower(trim(col("text"))), " +").as("toks"))
      .as[(Long, Seq[String])].collect()
    val blocks = docs.flatMap { case (_, toks) =>
      toks.grouped(16).map(_.mkString(" "))
    }
    assert(got.map(_._3).sum == blocks.distinct.length, "keeper per distinct block")
    assert(got.map(_._2).sum == blocks.length, "block totals conserve")
  }

  test("SRP signatures are deterministic, 16-bit, and bucket counts are consistent") {
    import spark.implicits._
    val got = SparkEntry.queries("sim_srp_buckets")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, sig, _) => assert(sig >= 0 && sig < 65536) }
    val bySig = got.groupBy(_._2)
    got.foreach { case (id, sig, n) =>
      assert(n == bySig(sig).length, s"vec=$id bucket count")
    }
    val again = SparkEntry.queries("sim_srp_buckets")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)), "deterministic")
  }
}
