package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in per-module registries (graft.Registry.all); this
  * object just exposes them in the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's clean+AI pipeline (etl_core.py:22-76) over
    * the documents table: dropna(any) → deterministic sentiment. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.Pipelines.cleanAi(
      io.Tables.documents(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL per oracle-able query (same column names and
    * ORDER BY as the Spark side — the driver hash-compares values under
    * name-sorted columns). */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
