package graft.pipeline

import graft.functions.{Exprs, Scrypt}
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
  * State lives behind a [[CatalogStore]]: parquet directories by
  * default, or any JDBC database via [[JdbcCatalog]] (the reference
  * keeps these tables in Postgres — db.py:12-14). Password storage:
  * the engine writes its salted-SHA-256 scheme by default and ALSO
  * verifies werkzeug `scrypt:N:r:p$salt$hex` hashes (app.py:88,102 via
  * [[Scrypt]]), so a users table migrated verbatim from the reference
  * logs in unchanged; pass `method = "scrypt"` to register in the
  * reference's own format.
  */
final class JobService(spark: SparkSession, store: CatalogStore) {
  import JobService._

  def this(spark: SparkSession, catalogDir: String) =
    this(spark, new ParquetCatalog(spark, catalogDir))

  def users: DataFrame = store.readUsers()
  def jobs: DataFrame = store.readJobs()

  /** app.py:74-94 — duplicate username rejected (uniqueness probe),
    * password stored as salted hash. `method`: "sha256" (engine
    * default) or "scrypt" (werkzeug wire format, reference app.py:88).
    */
  def register(username: String, password: String,
      method: String = "sha256"): Boolean = synchronized {
    // synchronized: register/startEtl are read-modify-write cycles
    // (max(id)+1 allocation + full-table rewrite from the read) — two
    // unserialized calls would mint the same id and the second write
    // would drop the first's row (last-writer-wins). The lock makes
    // THIS service single-writer, matching the CatalogStore contract
    // (one writer per store, like the reference's DB session; a
    // multi-process deployment uses JdbcCatalog where the database
    // serializes).
    val existing = users
    if (!existing.filter(col("username") === username).isEmpty) false
    else {
      val maxId = existing.agg(coalesce(max("id"), lit(0L))).head().getLong(0)
      val hashed = method match {
        case "scrypt" => lit(Scrypt.generate(password))
        case _ => Exprs.hashPassword(lit(password), lit(username))
      }
      val row = spark.range(1).select(
        lit(maxId + 1).as("id"),
        lit(username).as("username"),
        hashed.as("password"),
        current_timestamp().as("created_at"))
      store.writeUsers(existing.unionByName(row))
      true
    }
  }

  /** app.py:97-109 — point lookup + hash verify. Accepts both the
    * engine's sha256 scheme (verified by the SAME Exprs.checkPassword
    * expression register writes with — one source of truth) and
    * werkzeug scrypt hashes (a migrated reference users table
    * verifies as-is). */
  def login(username: String, password: String): Boolean = {
    val row = users.filter(col("username") === username)
      .select(col("password"),
        Exprs.checkPassword(lit(password), lit(username), col("password"))
          .as("sha_ok"))
      .limit(1).collect().headOption
    row.exists { r =>
      val stored = r.getString(0)
      if (stored.startsWith("scrypt:")) Scrypt.verify(stored, password)
      else r.getBoolean(1)
    }
  }

  /** app.py:141-189 — job-state machine around the ETL pipeline.
    * Returns the job id; the job ends Completed (with result_url) or
    * Failed. */
  def startEtl(username: String, inPath: String, outPath: String,
      opts: Pipelines.EtlOptions = Pipelines.EtlOptions()): Long = {
    // fail like the reference's auth check (an error naming the input),
    // not with an opaque NoSuchElementException off an empty head()
    val userId = users.filter(col("username") === username)
      .select("id").limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"startEtl: unknown user '$username'"))
      .getLong(0)
    val fileName = inPath.split('/').last
    // insert (id allocation + Processing row) under the single-writer
    // lock; the pipeline itself runs OUTSIDE it
    val jobId = synchronized {
      val existing = jobs
      val id = existing.agg(coalesce(max("id"), lit(0L))).head().getLong(0) + 1
      store.writeJobs(existing.unionByName(
        jobRow(id, fileName, userId, "Processing", None, insert = true)))
      id
    }
    val ok = Pipelines.processData(spark, inPath, outPath, opts)
    val done =
      if (ok) jobRow(jobId, fileName, userId, "Completed", Some(outPath),
        insert = false)
      else jobRow(jobId, fileName, userId, "Failed", None, insert = false)
    synchronized { store.writeJobs(graft.io.Catalog.mergeJobs(jobs, done)) }
    jobId
  }

  /** One job row. The completion update (insert = false) carries a
    * NULL upload_time so mergeJobs' coalesce KEEPS the insert-time
    * value — the reference sets upload_time once at insert and never
    * updates it (a fresh current_timestamp() here silently rewrote it
    * to the completion time and reordered listJobs). */
  private def jobRow(jobId: Long, fileName: String, userId: Long,
      status: String, resultUrl: Option[String], insert: Boolean) =
    spark.range(1).select(
      lit(jobId).as("id"), lit(fileName).as("filename"),
      lit(status).as("status"),
      resultUrl.map(lit(_)).getOrElse(lit(null).cast("string")).as("result_url"),
      (if (insert) current_timestamp()
       else lit(null).cast("timestamp")).as("upload_time"),
      lit(userId).as("user_id"))

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
