package graft

import graft.text.{Dedup, DedupIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated probe-only A/B for the bucket-stats sidecar (SERIAL.md
  * "sidecar A/B"): same session, same staged three-part artifact, same
  * delta — only the probe's stats/postings sourcing differs.
  *
  *  - A (production): [[Dedup.readIndex]] — candidate join reads the
  *    persisted postings, hot-bucket stats sum the persisted
  *    |buckets|-row `bk` sidecar with the delta's own counts.
  *  - B (pre-r9 shape): [[DedupIndex.fromDocs]] over the persisted
  *    per-doc `ix` table — postings re-EXPLODED and stats re-GROUPED
  *    from the corpus-sized band arrays on every probe.
  *
  * The removed term in A is corpus-proportional while the delta-side
  * work is fixed, so A's advantage must GROW with the corpus — this
  * main exists to measure that share at several corpus sizes instead
  * of asserting the asymptote (run at sf0.1 and target/sf1.0x).
  *
  * Usage: runMain graft.SidecarAb <sfDir> [reps]
  * Prints per-rep `[ab] rep=N sidecar=X derive=Y` lines to stderr and
  * a final one-line summary (min-warm, share) to stdout.
  */
object SidecarAb {
  def main(args: Array[String]): Unit = {
    // %.3f summary lines must parse on comma-decimal machines — same
    // pin as Bench (US, not ROOT: Derby validates the default locale)
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sidecar-ab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 7 <= 5)
    val delta = docs.filter(col("doc_id") % 7 === 6)
    val root = java.nio.file.Files.createTempDirectory("graft_ab_ix").toString
    val t0 = System.nanoTime()
    Dedup.writeIndex(base, "doc_id", "text", root)
    System.err.println(f"[ab] staged base=${base.count()} " +
      f"delta=${delta.count()} build=${(System.nanoTime() - t0) / 1e9}%.2f s")

    def probe(ix: DedupIndex): Long =
      Dedup.incrementalAcceptIndexed(ix, delta, "doc_id", "text").count()
    def time(f: => Long): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    // interleave A and B so ambient drift hits both; rep 1 is the cold
    // run (delta-kernel memo fill benefits whichever goes first, so A
    // and B alternate the lead)
    val as = Array.ofDim[Double](reps)
    val bs = Array.ofDim[Double](reps)
    for (r <- 0 until reps) {
      val aFirst = r % 2 == 0
      val (a, b) =
        if (aFirst)
          (time(probe(Dedup.readIndex(spark, root))),
            time(probe(DedupIndex.fromDocs(
              spark.read.parquet(s"$root/ix")))))
        else {
          val bb = time(probe(DedupIndex.fromDocs(
            spark.read.parquet(s"$root/ix"))))
          (time(probe(Dedup.readIndex(spark, root))), bb)
        }
      as(r) = a; bs(r) = b
      System.err.println(f"[ab] rep=${r + 1} sidecar=$a%.3f derive=$b%.3f")
    }
    // warm = min over reps 2..n (rep 1 carries memo/IO warmup);
    // a single-rep invocation reports that one rep rather than
    // crashing on empty.min
    val aw = (if (reps > 1) as.drop(1) else as).min
    val bw = (if (reps > 1) bs.drop(1) else bs).min
    spark.stop()
    println(f"""{"sf":"$dir","sidecar_warm":$aw%.3f,"derive_warm":$bw%.3f,""" +
      f""""share_pct":${100.0 * (bw - aw) / bw}%.1f}""")
  }
}
