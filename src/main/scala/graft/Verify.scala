package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration hook: SPARK_GRAFT_ONLY=q1,q2 restricts the dump
    // (unset for the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // the banded sign-LSH family's oracles are re-rendered at the
    // width the engine actually resolves for THIS corpus (the
    // registered entries spell the ≤6400-vector gate floor, bits=8):
    // same memoized corpus-stats job, same resolveWidth rule, so the
    // DuckDB check exercises the band construction that really ran —
    // at a grown verify corpus the auto-width regime is hash-checked,
    // not just measured. At every driver-gate SF the rendered SQL is
    // identical to the registered spelling.
    // a throw here (corpus unreadable, stats job failure) must not
    // zero the WHOLE round's oracle dump — fall back to the
    // registered gate-width spellings, which are correct for every
    // corpus the gate actually runs
    val resolved =
      try graft.sim.SimQueries.resolvedBandedOracles(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] banded oracle re-render failed " +
          s"(falling back to gate-width spellings): ${e.getMessage}")
        Map.empty[String, String]
      }
    val oracles = SparkEntry.oracleSql ++ resolved
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
