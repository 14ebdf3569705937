package graft

import graft.sim.{Pq, PqIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade evidence for the persisted PQ index (SERIAL.md, verdict r12
  * task #3): BUILD wall (train + encode + persist over the % 5 ≠ 0
  * base) vs INCREMENTAL wall (the % 5 = 0 delta encoded at the frozen
  * persisted codebook) — the delta path must never pay the training
  * cost, so its wall tracks |delta|, not |corpus|.
  * Usage: runMain graft.PqIndexAb <sfDir> [reps]. */
object PqIndexAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_pqab").toString
    def time[T](f: => T): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    val buildWall = time(PqIndex.writeIndex(base, root))
    val cb = spark.read.parquet(s"$root/codebook")
    val incWalls = (1 to reps).map(_ =>
      time(Pq.encodeAt(delta, cb)
        .write.format("noop").mode("overwrite").save()))
    System.err.println("[pq-ab] inc=" +
      incWalls.map(w => f"$w%.2f").mkString(","))
    // refresh = retrain + re-encode + publish over the FULL corpus as
    // the next model generation — priced against the build so the
    // decade row shows refresh ≈ build (a retrain IS a build; the
    // lifecycle's value is that serving never stops and generation 0
    // stays intact) while the append path stays delta-sized.
    PqIndex.appendIndex(root, delta)
    val refreshWall = time(PqIndex.refreshIndex(spark, root, emb))
    println(f"[pq-ab] $dir base=${base.count()} delta=${delta.count()} " +
      f"build_wall=$buildWall%.2f inc_wall_min=${incWalls.min}%.2f " +
      f"refresh_wall=$refreshWall%.2f")
    spark.stop()
  }
}
