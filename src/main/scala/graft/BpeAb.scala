package graft

import graft.text.Bpe
import org.apache.spark.sql.SparkSession

/** A/B evidence for BPE incremental pair-count maintenance (SERIAL.md,
  * verdict r13 task #3): [[Bpe.learn]] (per-merge DELTA aggregation
  * over only the words containing the merged pair) vs
  * [[Bpe.learnRecount]] (the pre-r14 full recount per merge) at a
  * non-toy merge count. Requires the merge sequences be identical
  * (exact-integer counts, same tie-break — the equivalence BpeSpec
  * also pins at CI scale), then prints both walls; past the first few
  * merges the affected-word fraction collapses, so the incremental
  * wall should hold roughly flat per iteration while the recount wall
  * pays the full vocab explode every time.
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f; (v, (System.nanoTime() - t) / 1e9)
    }
    val (inc, wInc) = time(Bpe.learn(docs, nMerges))
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
