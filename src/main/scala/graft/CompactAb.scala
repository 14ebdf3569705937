package graft

import graft.sim.EmbIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-wall A/B around sidecar compaction (SERIAL.md, verdict r12
  * task #1 evidence): stages an embedding band index over the
  * vec_id % 8 = 0 base, appends the % 8 ∈ {1..appends} deltas (each
  * leaving a `bk` occupancy partial row-set), probes the % 8 = 7
  * delta with the partials in place, then runs
  * [[EmbIndex.compactIndexStats]] and probes again — the probe result
  * must be bit-identical (asserted via count + checksum) and the wall
  * flat-or-better, while the sidecar row count returns to one row per
  * bucket. Usage: runMain graft.CompactAb <sfDir> [appends] [reps]. */
object CompactAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val appends = if (args.length > 1) args(1).toInt else 3
    val reps = if (args.length > 2) args(2).toInt else 3
    require(appends >= 1 && appends <= 6, "appends must use %8 slots 1..6")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_cab").toString
    EmbIndex.writeIndex(emb.filter(col("vec_id") % 8 === 0), root)
    (1 to appends).foreach(m =>
      EmbIndex.appendIndex(root, emb.filter(col("vec_id") % 8 === m)))
    val delta = emb.filter(col("vec_id") % 8 === 7)
    def bkRows = spark.read.parquet(
      graft.text.Dedup.livePath(root, "bk").toString).count()
    def probe(): (Long, Long) = {
      val r = EmbIndex.incrementalAcceptIndexed(
          EmbIndex.readIndex(spark, root), delta, 1, 5)
        // coalesce: sum is NULL on an all-rejected delta — report
        // (0, 0) instead of NPE-ing the harness before any output
        .agg(count(lit(1)), coalesce(sum(col("vec_id")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f
      (v, (System.nanoTime() - t) / 1e9)
    }
    val rowsPre = bkRows
    val pre = (1 to reps).map(_ => time(probe()))
    val (_, compactWall) = time(EmbIndex.compactIndexStats(spark, root))
    val rowsPost = bkRows
    val post = (1 to reps).map(_ => time(probe()))
    require(pre.map(_._1).distinct.size == 1 &&
      pre.head._1 == post.head._1 && post.map(_._1).distinct.size == 1,
      "probe result changed across compaction")
    System.err.println("[compact-ab] pre=" +
      pre.map(p => f"${p._2}%.2f").mkString(",") + " post=" +
      post.map(p => f"${p._2}%.2f").mkString(","))
    println(f"[compact-ab] $dir appends=$appends bk_rows=$rowsPre->$rowsPost " +
      f"compact_wall=$compactWall%.2f " +
      f"probe_pre_min=${pre.map(_._2).min}%.2f " +
      f"probe_post_min=${post.map(_._2).min}%.2f " +
      f"accepted=${post.head._1._1} checksum=${post.head._1._2}")
    spark.stop()
  }
}
