package graft

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-cost evidence for the text lookup path
  * ([[graft.text.Dedup.lookupReport]]) at verbatim-mass density — the
  * crawl-spam shape the fp machinery exists for. Two batches against
  * the SAME persisted index:
  *
  *  A. the distinct query batch — the sfDir's % 5 = 0 docs;
  *  B. the REPLICATED batch — every A doc duplicated R times verbatim
  *     under fresh ids (id·R + r), the density target/spam1000x models.
  *
  * The lookup posture collapses a batch to one representative per
  * distinct shingle-set fingerprint BEFORE any probe work, so B must
  * cost ~A plus a map-side verdict propagation — NOT R × A (the naive
  * per-doc spelling's bill). Correctness is require()d, not sampled:
  * every B replica's verdict must equal its source doc's A verdict
  * (the per-key verdict propagated to every member), which also pins
  * that the collapse changes COST only. Prints both walls and the
  * replica factor actually probed.
  *
  * Usage: runMain graft.ServeAb <sfDir> [R, default 200] */
object ServeAb {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 200
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
    val root = java.nio.file.Files.createTempDirectory("graft_serveab").toString
    def time[T](f: => T): (T, Double) = {
      val t = System.nanoTime(); val v = f; (v, (System.nanoTime() - t) / 1e9)
    }
    val (_, wBuild) = time(Dedup.writeIndex(base, "doc_id", "text", root))
    val ix = Dedup.readIndex(spark, root)
    def verdicts(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.select("doc_id", "dup").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (a, wA) = time(verdicts(
      Dedup.lookupReport(ix, delta, "doc_id", "text")))
    // the verbatim mass: every delta doc R times under fresh ids —
    // staged to parquet first so B's wall measures the PROBE, not the
    // in-memory replication
    val spamPath = s"$root/__spam"
    delta.crossJoin(
        spark.range(factor.toLong).select(col("id").as("__r")))
      .select((col("doc_id") * factor + col("__r")).as("doc_id"),
        col("text"))
      .write.mode("overwrite").parquet(spamPath)
    val spam = spark.read.parquet(spamPath)
    val nSpam = spam.count()
    val (b, wB) = time(verdicts(
      Dedup.lookupReport(ix, spam, "doc_id", "text")))
    require(b.size == nSpam, s"lost verdict rows: ${b.size} of $nSpam")
    // every replica inherits its source doc's verdict exactly
    val bad = b.filter { case (id, v) => a(id / factor) != v }
    require(bad.isEmpty,
      s"replica verdict drift: ${bad.take(5)}")
    println(f"[serve-ab] $dir base=${base.count()} distinct=${a.size} " +
      f"replicated=$nSpam (R=$factor) build_wall=$wBuild%.1f " +
      f"lookup_wall=$wA%.1f mass_lookup_wall=$wB%.1f " +
      f"naive_bill=${wA * factor}%.0f (verdicts ≡ per source doc)")
    spark.stop()
  }
}
