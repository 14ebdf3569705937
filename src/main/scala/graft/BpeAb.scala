package graft

import graft.text.Bpe
import org.apache.spark.sql.SparkSession

/** A/B evidence for BPE incremental pair-count maintenance (SERIAL.md,
  * verdict r13 task #3): [[Bpe.learnDelta]] (per-merge DELTA
  * aggregation over only the words containing the merged pair) vs
  * [[Bpe.learnRecount]] (full recount per merge) at a non-toy merge
  * count. Requires the merge sequences and final word tables be
  * identical (exact-integer counts, same tie-break — the equivalence
  * BpeSpec also pins at CI scale), then prints both walls. NOTE the
  * testdata corpora have ~10²-type vocabularies (31 types at sf0.1),
  * far below [[Bpe.BigVocabTypes]] — recount WINS there by design
  * (the delta path's extra per-merge jobs outweigh a trivial vocab
  * explode), which is exactly why [[Bpe.learn]] switches strategy on
  * the measured type count; this main's contract is the bit-equality
  * of the two strategies, priced at whatever corpus it is given.
  * Usage: runMain graft.BpeAb <sfDir> [nMerges=64]. */
object BpeAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // `synth:<nTypes>` generates a large-vocabulary corpus in-engine
    // (the testdata corpora have ~10²-type vocabularies, far below the
    // regime the delta path exists for): nTypes distinct words, each a
    // deterministic 12-char base-26 spelling of its id with Zipf-ish
    // weight — a 10⁵⁺-type vocabulary prices the recount's full
    // explode against the delta's support-sized one at the scale the
    // strategy switch actually flips.
    import org.apache.spark.sql.functions._
    val docs =
      if (dir.startsWith("synth:")) {
        val n = dir.drop(6).toLong
        spark.range(n).select(col("id").as("doc_id"),
          concat(lit("w"),
            expr("conv(CAST(id AS STRING), 10, 26)"),
            lit(" the quick brown fox"),
            expr("CASE WHEN id % 3 = 0 THEN ' jumps over' ELSE '' END"))
            .as("text"))
      } else spark.read.parquet(s"$dir/documents.parquet")
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f; (v, (System.nanoTime() - t) / 1e9)
    }
    val (inc, wInc) = time(Bpe.learnDelta(docs, nMerges))
    val (rec, wRec) = time(Bpe.learnRecount(docs, nMerges))
    require(inc.merges == rec.merges,
      s"merge sequences diverged: incremental=${inc.merges.take(5)}… " +
        s"recount=${rec.merges.take(5)}…")
    val wordsEq = inc.words.select("w", "f", "syms")
      .exceptAll(rec.words.select("w", "f", "syms")).isEmpty &&
      rec.words.select("w", "f", "syms")
        .exceptAll(inc.words.select("w", "f", "syms")).isEmpty
    require(wordsEq, "final word-type tables diverged")
    println(f"[bpe-ab] $dir merges=${inc.merges.size} (asked $nMerges) " +
      f"incremental_wall=$wInc%.1f recount_wall=$wRec%.1f " +
      f"speedup=${wRec / wInc}%.2f  merge-for-merge identical, " +
      "final words identical")
    spark.stop()
  }
}
