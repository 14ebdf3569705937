package graft

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Engine-side equivalence evidence for the incremental text-dedup
  * probe at corpora where the exact-Jaccard DuckDB oracle is
  * infeasible (SERIAL.md round 14: at target/sf10.0x the oracle
  * spills > 90 GB and dies on disk; only dedup_index_build/compact
  * complete there). Three spellings of the SAME contract must agree
  * on the accepted id set:
  *
  *  A. the production probe — persisted index, maxBucket = 100
  *     (fp screen + hot-bucket cascade routing);
  *  B. the guard-free probe — same persisted index, maxBucket =
  *     Int.MaxValue (NO bucket is ever hot, so the plan is the
  *     direct complete pairing: every LSH candidate verified, no
  *     screen, no cascade) — an independent exactness check of the
  *     cascade at true replica-mass density;
  *  C. the inline spelling — no persisted artifacts at all, the
  *     index derived in-plan from the base corpus
  *     ([[Dedup.incrementalAccept]]) — validating the persisted
  *     write→read round trip (postings/bk/fp/manifest derivations)
  *     against in-plan derivation.
  *
  * plus D — the CASCADE route forced (cascadeBudget = 0), for
  * corpora where the load router would pick direct pairing.
  *
  * A ≡ B pins that the routing layers change COST only; A ≡ C pins
  * the artifact round trip; A ≡ D pins the screen/escalation stages
  * at whatever density the corpus has. Prints the walls and the
  * accepted count. Measured at target/sf10.0x (where the DuckDB
  * oracle dies at > 90 GB spill): A ≡ B ≡ C ≡ D, 907 accepted; the
  * direct plan is still feasible there (hot-bucket load 2.5e7 pairs,
  * max occupancy ~400) — the cascade's regime is the 1000×/spam-mass
  * density where the direct load keeps growing quadratically while
  * the screen stays support-bounded.
  * Usage: runMain graft.DedupIncAb <sfDir> [modes; default ABC —
  * pass e.g. "AD" or "ABCD" to include the forced-cascade leg]. */
object DedupIncAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val modes = if (args.length > 1) args(1) else "ABC"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_incab").toString
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f; (v, (System.nanoTime() - t) / 1e9)
    }
    val (_, wBuild) = time(Dedup.writeIndex(base, "doc_id", "text", root))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val (a, wA) = time(ids(Dedup.incrementalAcceptIndexed(
      Dedup.readIndex(spark, root), delta, "doc_id", "text")))
    // which plan did the ROUTER pick for A, and at what estimated
    // load? At the mirror-replica density the cascade must fire from
    // the router itself (not only via the forced-budget D leg).
    val routed = Dedup.lastRouterDecision
      .map { case (c, l) => f" router=${if (c) "CASCADE" else "direct"}(load=$l%.3g)" }
      .getOrElse("")
    val bLine =
      if (!modes.contains("B")) "  B skipped (guard-free infeasible here)"
      else {
        val (b, wB) = time(ids(Dedup.incrementalAcceptIndexed(
          Dedup.readIndex(spark, root), delta, "doc_id", "text",
          maxBucket = Int.MaxValue)))
        require(a == b,
          s"cascade != guard-free: onlyA=${(a -- b).take(5)} onlyB=${(b -- a).take(5)}")
        f"  guardfree_wall=$wB%.1f (A ≡ B)"
      }
    val cLine =
      if (!modes.contains("C")) "  C skipped"
      else {
        val (c, wC) = time(ids(Dedup.incrementalAccept(
          base, delta, "doc_id", "text")))
        require(a == c,
          s"staged != inline: onlyA=${(a -- c).take(5)} onlyC=${(c -- a).take(5)}")
        f"  inline_wall=$wC%.1f (A ≡ C)"
      }
    // D: the CASCADE route forced (cascadeBudget = 0) — at corpora
    // where the load router would pick direct pairing, this is the
    // only way to exercise the screen/escalation stages at scale
    val dLine =
      if (!modes.contains("D")) ""
      else {
        val (dd, wD) = time(ids(Dedup.incrementalAcceptIndexed(
          Dedup.readIndex(spark, root), delta, "doc_id", "text",
          cascadeBudget = 0L)))
        require(a == dd,
          s"direct != forced-cascade: onlyA=${(a -- dd).take(5)} onlyD=${(dd -- a).take(5)}")
        f"  cascade_forced_wall=$wD%.1f (A ≡ D)"
      }
    println(f"[dedup-inc-ab] $dir base=${base.count()} delta=${delta.count()} " +
      f"accepted=${a.size} build_wall=$wBuild%.1f probe_wall=$wA%.1f" +
      routed + bLine + cLine + dLine)
    spark.stop()
  }
}
