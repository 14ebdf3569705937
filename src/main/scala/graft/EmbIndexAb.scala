package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the persisted embedding band index
  * (SERIAL.md): per-phase walls for (a) the one-time index BUILD over
  * the base corpus (vec_id % 5 ≠ 0), (b) the recurring delta PROBE
  * (vec_id % 5 = 0 screened against the persisted artifact), and (c)
  * the from-scratch banded stats build over the same full corpus —
  * the session path the index replaces. The claim under measurement:
  * the probe is delta-sized (reads persisted integer artifacts, never
  * re-quantizes base vectors — EmbIndexSpec pins the plan property),
  * so the recurring cost detaches from the corpus size.
  *
  * Usage: runMain graft.EmbIndexAb <sfDir> [reps]
  */
object EmbIndexAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-embindex-ab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.io.Tables.embeddings(spark, dir)
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    System.err.println(
      s"corpus=${emb.count()} base=${base.count()} delta=${delta.count()}")

    def timed(name: String)(body: => Long): Unit =
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = body
        System.err.println(f"[embix-ab] $name rep=$r wall=${
          (System.nanoTime() - t0) / 1e9}%.2f rows=$n")
      }

    val root = java.nio.file.Files.createTempDirectory("graft_embix_ab")
      .toString
    timed("index_build") { // one-time; reps overwrite in place
      graft.sim.EmbIndex.writeIndex(base, root)
      spark.read.parquet(s"$root/vecs").count()
    }
    System.err.println(s"[embix-ab] manifest = ${
      graft.sim.EmbIndex.readManifest(spark, root)}")
    timed("delta_probe") {
      graft.sim.EmbIndex.incrementalAcceptIndexed(
        graft.sim.EmbIndex.readIndex(spark, root), delta, 1, 5).count()
    }
    timed("from_scratch_banded_stats") {
      graft.sim.Similarity.bandedCandidateStatsUncached(emb, 100,
        graft.sim.Similarity.resolveWidth(emb.count(),
          64, 100)._1).count()
    }
    graft.text.Dedup.deleteRecursively(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
