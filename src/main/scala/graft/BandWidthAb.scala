package graft

import graft.sim.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated A/B for the sign-band WIDTH knob (SERIAL.md "band-width
  * A/B"): the banded-LSH family's bucket space is 2·2^bits, so per-band
  * occupancy grows as n/2^bits — once it crosses the hot-bucket guard
  * (maxBucket=100) the guard drops the bucket and the probe goes BLIND
  * on that slice of the corpus. Measured at the 100× replica corpus
  * (200 k vectors): 8-bit bands leave 2 of 512 buckets under the guard
  * (200 of 400 k postings survive — the probe is effectively off);
  * widening the bands restores discrimination at the same guard.
  *
  * For each width this main reports candidate pairs, verified
  * ε-pairs (cos ≥ 1/5, exact-integer), surviving postings, and the
  * candidate-stage wall — the evidence that band width, not the
  * guard, is the right corpus-size response (the guard's job is
  * protecting the join from degenerate buckets, not rate-limiting a
  * saturated band space).
  *
  * Usage: runMain graft.BandWidthAb <sfDir> [bits,bits,...] [reps]
  * (bits value 0 = the AutoBandBits sizing rule — the row proving the
  * registered defaults survive the corpus with zero configuration)
  */
object BandWidthAb {
  def main(args: Array[String]): Unit = {
    // %.3f summary lines must parse on comma-decimal machines — same
    // pin as Bench (US, not ROOT: Derby validates the default locale)
    java.util.Locale.setDefault(java.util.Locale.US)
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.BandWidthAb <sfDir> [bits,bits,...] [reps]" +
          " (bits 0 = auto)")
      sys.exit(2)
    }
    val dir = args(0)
    val bitsList = (if (args.length > 1) args(1) else "8,12")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bandwidth-ab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    bitsList.foreach { bits0 =>
      // 0 = the registered defaults' auto rule (resolved through the
      // same corpus-stats + resolveWidth spelling the entry points
      // use, dimensionality clamp included); print the resolution
      val bits = if (bits0 == Similarity.AutoBandBits) {
        val row = emb.agg(count(lit(1)),
          coalesce(min(size(col("embedding"))), lit(64))).head()
        Similarity.resolveWidth(row.getLong(0), row.getInt(1), 100)._1
      } else bits0
      if (bits0 == Similarity.AutoBandBits)
        System.err.println(s"[ab] auto resolved bits=$bits")
      // surviving postings under the guard at this width; coalesce the
      // sums — on an EMPTY embeddings input they come back null
      val h = emb.select(
        explode(Similarity.signBandKeys(col("embedding"), bits)).as("bk"))
      val occ = h.groupBy("bk").agg(count(lit(1)).as("n"))
      val Array(buckets, small, kept) = occ.agg(
        count(lit(1)),
        coalesce(sum(when(col("n") <= 100, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("n") <= 100, col("n")).otherwise(0L)), lit(0L)))
        .collect().head.toSeq.map(v => v.asInstanceOf[Long]).toArray
      val walls = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val stats = Similarity.bandedCandidateStats(emb, 100, bits)
          .localCheckpoint()
        val cand = stats.count()
        val eps = stats
          .filter(col("na") > 0 && col("nb") > 0 && col("dot") >= 0 &&
            col("dot").cast("decimal(38,0)") * col("dot").cast("decimal(38,0)")
              * lit(25L) >=
              col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)"))
          .count()
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(
          f"[ab] bits=$bits rep=$r wall=$w%.2f cand=$cand eps=$eps")
        (w, cand, eps)
      }
      val (minW, cand, eps) = walls.minBy(_._1)
      println(f"bits=$bits buckets=$buckets under_guard=$small " +
        f"postings_kept=$kept cand=$cand eps_pairs=$eps min_wall=$minW%.2f")
    }
    spark.stop()
  }
}
