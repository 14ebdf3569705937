package graft.pipeline

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Storage backend for the control-plane catalog (`users` / `jobs` —
  * reference models.py:8-35). Two implementations:
  *
  *  - [[ParquetCatalog]]: lake-native parquet directories with
  *    temp+swap overwrite (a failed write never truncates the table);
  *  - [[JdbcCatalog]]: a live RDBMS via `spark.read.jdbc` /
  *    `DataFrameWriter.jdbc` — the reference keeps these tables in
  *    Postgres behind SQLAlchemy (reference db.py:12-14, app.py:34-36);
  *    any JDBC url works (unit-tested against embedded Derby — no
  *    network in the test environment).
  *
  * Both implementations overwrite by staging the full new version
  * BEFORE touching the live table (the new version usually derives
  * from a read of the very table being replaced, and Spark plans are
  * lazy — dropping the target mid-read would race), then swapping via
  * rename with rollback on failure. Neither path materializes rows on
  * the driver, so either scales past control-plane sizes.
  */
trait CatalogStore {
  def readUsers(): DataFrame
  def readJobs(): DataFrame
  def writeUsers(df: DataFrame): Unit
  def writeJobs(df: DataFrame): Unit
}

/** Parquet-backed catalog under `catalogDir` (the engine default). */
final class ParquetCatalog(spark: SparkSession, catalogDir: String)
    extends CatalogStore {
  import JobService.{JobsSchema, UsersSchema}

  private val usersPath = s"$catalogDir/users"
  private val jobsPath = s"$catalogDir/jobs"

  private def readOr(path: String, schema: StructType): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

  private def overwrite(df: DataFrame, path: String): Unit = {
    val tmp = s"$path.tmp" // sibling of target → same filesystem rename
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(path)
    val old = new java.io.File(s"$path.old")
    if (target.exists()) {
      deleteRec(old)
      if (!target.renameTo(old))
        throw new IllegalStateException(
          s"catalog swap: cannot move $path aside — table left untouched")
    }
    if (!new java.io.File(tmp).renameTo(target)) {
      // roll the previous version back so a failed swap never leaves
      // the live path missing (a later read would rebuild from empty)
      if (old.exists()) old.renameTo(target)
      throw new IllegalStateException(s"catalog swap failed for $path")
    }
    deleteRec(old)
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) f.delete()
  }

  override def readUsers(): DataFrame = readOr(usersPath, UsersSchema)
  override def readJobs(): DataFrame = readOr(jobsPath, JobsSchema)
  override def writeUsers(df: DataFrame): Unit = overwrite(df, usersPath)
  override def writeJobs(df: DataFrame): Unit = overwrite(df, jobsPath)
}

/** JDBC-backed catalog — point at the reference's RDS and the same
  * JobService flows run against it unchanged. `url` is any JDBC url
  * (`jdbc:postgresql://…`, `jdbc:derby:…;create=true`); `props`
  * carries user/password/driver.
  */
final class JdbcCatalog(spark: SparkSession, url: String,
    props: Properties = new Properties()) extends CatalogStore {
  import JobService.{JobsSchema, UsersSchema}

  if (url.startsWith("jdbc:derby")) JdbcCatalog.registerDerbyVarcharDialect()

  // explicit VARCHARs: Spark's Derby dialect maps StringType to CLOB,
  // which cannot sit in a pushed-down equality predicate
  private val usersColTypes =
    "username VARCHAR(255), password VARCHAR(512)"
  private val jobsColTypes =
    "filename VARCHAR(512), status VARCHAR(32), result_url VARCHAR(1024)"

  /** True iff `table` exists — via connection metadata, so a missing
    * table is distinguishable from a connection failure: the latter
    * THROWS here and must propagate (swallowing it would make the next
    * overwrite rebuild the catalog from an empty read). */
  private def tableExists(table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try tableExistsOn(conn, table) finally conn.close()
  }

  private def tableExistsOn(conn: java.sql.Connection,
      table: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
    var found = false
    while (!found && rs.next())
      found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
    found
  }

  private def readOr(table: String, schema: StructType): DataFrame =
    if (tableExists(table)) {
      val df = spark.read.jdbc(url, table, props)
      // align nullability/order with the canonical schema
      df.select(schema.fieldNames.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
    } else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Stage-and-swap overwrite, mirroring [[ParquetCatalog]]'s temp+swap:
    * the new version is DISTRIBUTED-written to `<table>_stage` first
    * (reading the live target while writing a different table races
    * nothing), then one connection renames target→old, stage→target,
    * rolling old back into place if the second rename throws. No
    * `collect()` — the write path stays executor-side at any size. A
    * hard crash between the two renames leaves `_old`/`_stage` behind
    * (same exposure as the parquet swap); an exception rolls back.
    */
  private def overwrite(df: DataFrame, table: String,
      colTypes: String): Unit = {
    val stage = s"${table}_stage"
    val old = s"${table}_old"
    df.write.mode(SaveMode.Overwrite)
      .option("createTableColumnTypes", colTypes)
      .jdbc(url, stage, props)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      def rename(from: String, to: String): Unit = {
        val sql =
          if (url.startsWith("jdbc:derby")) s"RENAME TABLE $from TO $to"
          else s"ALTER TABLE $from RENAME TO $to"
        st.executeUpdate(sql); ()
      }
      if (tableExistsOn(conn, old)) st.executeUpdate(s"DROP TABLE $old")
      val hadTarget = tableExistsOn(conn, table)
      if (hadTarget) rename(table, old)
      try rename(stage, table)
      catch { case e: Throwable =>
        // a failed swap must never leave the live name missing — the
        // next read would silently rebuild the catalog from empty
        if (hadTarget) rename(old, table)
        throw e
      }
      if (hadTarget) st.executeUpdate(s"DROP TABLE $old")
      ()
    } finally conn.close()
  }

  override def readUsers(): DataFrame = readOr("users", UsersSchema)
  override def readJobs(): DataFrame = readOr("jobs", JobsSchema)
  override def writeUsers(df: DataFrame): Unit =
    overwrite(df, "users", usersColTypes)
  override def writeJobs(df: DataFrame): Unit =
    overwrite(df, "jobs", jobsColTypes)
}

object JdbcCatalog {
  @volatile private var derbyDialectRegistered = false

  /** Spark's built-in Derby dialect maps StringType to CLOB, and then
    * `stmt.setNull(CLOB)` for a null string (e.g. result_url before a
    * job completes) is rejected by Derby when the actual column is the
    * VARCHAR we created (ERROR 22005). Register a VARCHAR-first
    * override for `jdbc:derby:` urls only — an aggregated dialect
    * consults it first and falls through to the built-in for every
    * other type. Idempotent.
    */
  private[pipeline] def registerDerbyVarcharDialect(): Unit =
    if (!derbyDialectRegistered) synchronized {
      if (!derbyDialectRegistered) {
        org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
          new org.apache.spark.sql.jdbc.JdbcDialect {
            override def canHandle(url: String): Boolean =
              url.startsWith("jdbc:derby")
            override def getJDBCType(dt: org.apache.spark.sql.types.DataType)
                : Option[org.apache.spark.sql.jdbc.JdbcType] = dt match {
              case org.apache.spark.sql.types.StringType =>
                Some(org.apache.spark.sql.jdbc.JdbcType(
                  "VARCHAR(4000)", java.sql.Types.VARCHAR))
              case _ => None
            }
          })
        derbyDialectRegistered = true
      }
    }
}
