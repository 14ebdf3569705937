package graft

import org.apache.spark.sql.SparkSession

/** Runs the DBSCAN invariant audit ([[graft.sim.DbscanAudit]]) against
  * an sf dir — the 100×-corpus verification path for cluster_dbscan,
  * where the DuckDB oracle's transitive-closure CTE is infeasible
  * (~10 M-pair ε-graph). Usage:
  * `runMain graft.DbscanAuditMain <sfDir>` — prints the counter map
  * and exits non-zero on any invariant violation. */
object DbscanAuditMain {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = graft.sim.DbscanAudit.audit(io.Tables.embeddings(spark, sfDir))
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[dbscan-audit] $sfDir wall=$wall%.1fs " +
      out.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
