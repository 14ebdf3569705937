package graft

import graft.multimodal.{MmIndex, MultimodalQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade evidence for the persisted multimodal perceptual-hash index:
  * the probe's recurring cost is DELTA decode + a fingerprint
  * anti-join, independent of how many media bytes the index covers.
  *
  * Protocol: build the signature index over the sfDir lake's
  * % 5 ≠ 0 population (one decode pass — the pay-once moment), then
  * probe with a FIXED-SIZE delta (the 2 000 lowest % 5 = 0 doc_ids,
  * deterministic at any corpus size) and time the probe alone.
  * Across sf0.01 → sf0.1 → 10× the lake's media bytes grow ~10× per
  * decade while the fixed delta doesn't — a probe wall that stays
  * flat is the decode-once contract made measurable (the in-plan
  * mm_perceptual_dedup re-decodes the lake per run and scales with
  * it instead).
  *
  * Triangulation: the indexed probe's accepted set must equal the
  * inline spelling's (signatures derived in-plan from the base lake,
  * no persisted artifacts) — the write→read round trip pinned at
  * scale, same as DedupIncAb's A ≡ C leg.
  *
  * Usage: runMain graft.MmIndexAb <sfDir> [deltaN=2000] */
object MmIndexAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val deltaN = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = MultimodalQueries.media(spark, dir)
    val base = lake.filter(col("doc_id") % 5 =!= 0)
    val delta = lake.filter(col("doc_id") % 5 === 0)
      .orderBy("doc_id").limit(deltaN)
    val baseN = base.count()
    val baseBytes = base.agg(sum(length(col("payload")))).head().getLong(0)
    val root = java.nio.file.Files.createTempDirectory("graft_mmab").toString
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f; (v, (System.nanoTime() - t) / 1e9)
    }
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val (_, wBuild) = time(MmIndex.writeIndex(base, root))
    // probe twice: run 1 pays delta-side session costs, run 2 is the
    // recurring operating point (what the flat-across-decades claim
    // is about)
    val (a1, wP1) = time(ids(MmIndex.incrementalAccept(
      MmIndex.readIndex(spark, root), delta)))
    val (a2, wP2) = time(ids(MmIndex.incrementalAccept(
      MmIndex.readIndex(spark, root), delta)))
    require(a1 == a2, "probe not deterministic across runs")
    // inline triangulation: same accepted set with no persisted index
    val (c, wInline) = time(ids(MmIndex.incrementalAccept(
      MmIndex.signatures(spark, base), delta)))
    require(a1 == c,
      s"staged != inline: onlyA=${(a1 -- c).take(5)} onlyC=${(c -- a1).take(5)}")
    println(f"[mm-index-ab] $dir base_n=$baseN base_mb=${baseBytes / 1e6}%.1f " +
      f"delta_n=$deltaN accepted=${a1.size} build_wall=$wBuild%.1f " +
      f"probe_wall1=$wP1%.2f probe_wall2=$wP2%.2f inline_wall=$wInline%.2f " +
      "(staged ≡ inline)")
    spark.stop()
  }
}
