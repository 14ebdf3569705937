package graft.pipeline

import graft.functions.Exprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's control-plane API (app.py routes) re-expressed over
  * the engine's catalog tables — so a user of the reference can switch
  * wholesale:
  *
  *  - register  → uniqueness probe (semi-join shape) + salted-hash
  *                insert              (app.py:74-94)
  *  - login     → point lookup + hash verify        (app.py:97-109)
  *  - startEtl  → job INSERT (Processing) → pipeline → UPDATE
  *                Completed/Failed with result_url  (app.py:141-189);
  *                unlike the reference, failure is recorded (the
  *                frontend already rendered a Failed badge the backend
  *                never produced, SURVEY §2 control-plane note)
  *  - listJobs  → ORDER BY upload_time DESC + 5-column projection +
  *                strftime formatting               (app.py:194-208)
  *
  * State lives in parquet under `catalogDir` (stand-in for the RDS
  * tables; swap the read/write pair for `spark.read.jdbc` /
  * `df.write.jdbc` in production). Catalog writes go through a temp
  * path + swap so a failed write never truncates the table.
  */
final class JobService(spark: SparkSession, catalogDir: String) {
  import JobService._

  private val usersPath = s"$catalogDir/users"
  private val jobsPath = s"$catalogDir/jobs"

  private def readOr(path: String, schema: StructType): DataFrame =
    if (new java.io.File(path).exists()) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def overwrite(df: DataFrame, path: String): Unit = {
    val tmp = s"$path.tmp"
    df.write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(path)
    if (target.exists()) {
      val old = new java.io.File(s"$path.old")
      deleteRec(old)
      target.renameTo(old)
    }
    new java.io.File(tmp).renameTo(target)
    deleteRec(new java.io.File(s"$path.old"))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    if (f.exists()) f.delete()
  }

  def users: DataFrame = readOr(usersPath, UsersSchema)
  def jobs: DataFrame = readOr(jobsPath, JobsSchema)

  /** app.py:74-94 — duplicate username rejected (uniqueness probe),
    * password stored as salted hash. */
  def register(username: String, password: String): Boolean = {
    val existing = users
    if (!existing.filter(col("username") === username).isEmpty) false
    else {
      val maxId = existing.agg(coalesce(max("id"), lit(0L))).head.getLong(0)
      val row = spark.range(1).select(
        lit(maxId + 1).as("id"),
        lit(username).as("username"),
        Exprs.hashPassword(lit(password), lit(username)).as("password"),
        current_timestamp().as("created_at"))
      overwrite(existing.unionByName(row), usersPath)
      true
    }
  }

  /** app.py:97-109 — point lookup + hash verify. */
  def login(username: String, password: String): Boolean =
    !users
      .filter(col("username") === username &&
        Exprs.checkPassword(lit(password), lit(username), col("password")))
      .isEmpty

  /** app.py:141-189 — job-state machine around the ETL pipeline.
    * Returns the job id; the job ends Completed (with result_url) or
    * Failed. */
  def startEtl(username: String, inPath: String, outPath: String,
      opts: Pipelines.EtlOptions = Pipelines.EtlOptions()): Long = {
    val userId = users.filter(col("username") === username)
      .select("id").head.getLong(0)
    val existing = jobs
    val jobId = existing.agg(coalesce(max("id"), lit(0L))).head.getLong(0) + 1
    val fileName = inPath.split('/').last
    def jobRow(status: String, resultUrl: Option[String]) =
      spark.range(1).select(
        lit(jobId).as("id"), lit(fileName).as("filename"),
        lit(status).as("status"),
        resultUrl.map(lit(_)).getOrElse(lit(null).cast("string")).as("result_url"),
        current_timestamp().as("upload_time"), lit(userId).as("user_id"))
    overwrite(existing.unionByName(jobRow("Processing", None)), jobsPath)
    val ok = Pipelines.processData(spark, inPath, outPath, opts)
    val done =
      if (ok) jobRow("Completed", Some(outPath))
      else jobRow("Failed", None)
    overwrite(graft.io.Catalog.mergeJobs(jobs, done), jobsPath)
    jobId
  }

  /** app.py:194-208 — history listing: desc sort, 5-col projection,
    * formatted timestamp. */
  def listJobs(): DataFrame =
    jobs.orderBy(col("upload_time").desc, col("id").desc)
      .select(col("id"), col("filename"), col("status"), col("result_url"),
        Exprs.formatUploadTime(col("upload_time")).as("upload_time"))
}

object JobService {
  val UsersSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("password", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  val JobsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("result_url", StringType, nullable = true),
    StructField("upload_time", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false)))
}
