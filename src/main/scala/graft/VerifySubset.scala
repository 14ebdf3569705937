package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Ad-hoc filtered Verify (not part of the driver contract): dumps only
  * the named queries + their oracles, for fast check.py iteration on
  * new operators. Usage: runMain graft.VerifySubset <sfDir> <outDir> <name>...
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = Registry.all.filter(q => names.isEmpty || names(q.name))
    qs.foreach { q =>
      try q.fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${q.name}")
      catch { case e: Throwable =>
        System.err.println(s"[verify] ${q.name} failed: ${e.getMessage}")
      }
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // same banded-family width override as graft.Verify (see there),
    // with the same zero-the-round fallback guard
    val banded =
      try graft.sim.SimQueries.resolvedBandedOracles(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] banded oracle re-render failed " +
          s"(falling back to gate-width spellings): ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = qs.flatMap(q => q.oracle.map(o =>
        s"${esc(q.name)}: ${esc(banded.getOrElse(q.name, o))}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
