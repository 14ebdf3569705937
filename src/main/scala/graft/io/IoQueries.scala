package graft.io

import graft.Q
import org.apache.spark.sql.functions._

/** Source/sink operators (SURVEY.md §2.1 S1-S4 + §2.2 "formats beyond
  * CSV"). The CSV queries round-trip testdata through the CSV
  * source/sink with the reference's exact options (header + inferSchema
  * on read — pandas `pd.read_csv` parity; header, no index on write) and
  * then hash-compare against the oracle over the original parquet, so
  * the format conversion itself is under test.
  */
object IoQueries {

  private def tmp(d: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_io_${d.replaceAll("[^A-Za-z0-9]", "_")}/$name"

  def queries: Seq[Q] = Seq(
    // parquet source — the engine's native format (day-1 per SURVEY §2.2).
    Q("src_parquet",
      Some("SELECT * FROM nation ORDER BY n_nationkey"),
      (s, d) => Tables.nation(s, d).orderBy("n_nationkey")),

    // S1 — CSV scan with schema inference (app.py:47-50, etl_core.py:22-27):
    // parquet → CSV → inferred-schema read-back must hash-match the original.
    Q("src_csv",
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"),
      (s, d) => {
        val path = tmp(d, "nation_csv")
        Csv.write(Tables.nation(s, d), path)
        Csv.read(s, path)
          .select(col("n_nationkey").cast("int"), col("n_name"),
            col("n_regionkey").cast("int"))
          .orderBy("n_nationkey")
      }),

    // S2 — CSV sink, single-object contract (app.py:53-62: one S3 object
    // per job). repartition(1) on the final write only, never mid-plan
    // (and never coalesce(1) — it would single-thread the upstream plan
    // into the write task; measured in SERIAL.md's stage decomposition).
    Q("sink_csv",
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val path = tmp(d, "customer_csv")
        Csv.writeSingle(
          Tables.customer(s, d).select("c_custkey", "c_name", "c_mktsegment"), path)
        Csv.read(s, path)
          .select(col("c_custkey").cast("long"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey")
      }),

    // parquet sink — partitioned write + read-back.
    Q("sink_parquet",
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey"),
      (s, d) => {
        val path = tmp(d, "orders_parquet")
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(path)
        s.read.parquet(path).orderBy("o_orderkey")
      }),

    // JSON source/sink round-trip (the reference frontend advertises
    // .json uploads, templates/index.html:77 — realized here for real).
    Q("src_json",
      Some("""SELECT event_id, event_type, user_id FROM events
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        val path = tmp(d, "events_json")
        Tables.events(s, d).select("event_id", "event_type", "user_id")
          .write.mode("overwrite").json(path)
        s.read.json(path)
          .select(col("event_id").cast("long"), col("event_type"),
            col("user_id").cast("long"))
          .orderBy("event_id")
      }),

    // ORC source/sink round-trip (third columnar format).
    Q("src_orc",
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |ORDER BY s_suppkey""".stripMargin),
      (s, d) => {
        val path = tmp(d, "supplier_orc")
        Tables.supplier(s, d).select("s_suppkey", "s_name", "s_acctbal")
          .write.mode("overwrite").orc(path)
        s.read.orc(path).orderBy("s_suppkey")
      }),

    // line-oriented text source/sink (spark.read.text — the raw-corpus
    // ingest format; docs are single-line so the round-trip is lossless).
    Q("src_text",
      Some("SELECT text AS value FROM documents ORDER BY value"),
      (s, d) => {
        val path = tmp(d, "documents_text")
        Tables.documents(s, d).select("text")
          .write.mode("overwrite").text(path)
        s.read.text(path).orderBy("value")
      }),

    // schema-evolution read: two parquet generations with different
    // column sets (v1: doc_id+text; v2: doc_id+lang+n_chars) read as
    // ONE table via mergeSchema — missing columns null-fill per file.
    // The footer merge is metadata-only; at 100 TB the scan still
    // prunes columns per generation. Oracle: the explicit UNION of the
    // two generations with typed NULLs.
    Q("src_schema_evolution",
      Some("""SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang,
             |       CAST(NULL AS BIGINT) AS n_chars
             |FROM documents WHERE doc_id % 2 = 0
             |UNION ALL
             |SELECT doc_id, CAST(NULL AS VARCHAR), lang, n_chars
             |FROM documents WHERE doc_id % 2 = 1
             |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val base = tmp(d, "documents_evo")
        val docs = Tables.documents(s, d)
        docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$base/v1")
        docs.filter(col("doc_id") % 2 === 1).select("doc_id", "lang", "n_chars")
          .write.mode("overwrite").parquet(s"$base/v2")
        s.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
          .select("doc_id", "text", "lang", "n_chars")
          .orderBy("doc_id")
      }),

    // partition backfill via DYNAMIC partition overwrite: rewrite ONLY
    // the partitions present in the incoming frame (here: status 'F'
    // gets a recomputed priority), leaving every other partition's
    // files untouched — the lake-backfill primitive: a day's recompute
    // never rewrites the year. Static overwrite mode would truncate
    // the whole table; the reader sees patched F rows + originals.
    Q("sink_dynamic_overwrite",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |       CASE WHEN o_orderstatus = 'F' THEN 'BACKFILLED'
             |            ELSE o_orderpriority END AS o_orderpriority,
             |       o_orderstatus
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val base = tmp(d, "orders_dynover")
        val o = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderpriority", "o_orderstatus")
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
        o.filter(col("o_orderstatus") === "F")
          .withColumn("o_orderpriority", lit("BACKFILLED"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("o_orderstatus").parquet(base)
        s.read.parquet(base)
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderpriority", "o_orderstatus")
          .orderBy("o_orderkey")
      }),

    // fault-tolerant CSV ingestion (the engine's version of the
    // reference's try/except around pd.read_csv, etl_core.py:21-29):
    // PERMISSIVE mode + explicit schema lands malformed rows whole in
    // _corrupt_record instead of failing the job — one bad row in
    // 100 TB neither kills the pipeline nor disappears silently. The
    // staged file = nation rows + two hand-broken lines; the query
    // reports good/corrupt splits and proves the good rows parsed.
    Q("src_csv_permissive",
      Some("""SELECT count(*) + 2 AS n_total,
             |       count(*) AS n_good,
             |       CAST(2 AS BIGINT) AS n_corrupt,
             |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
             |FROM nation""".stripMargin),
      (s, d) => {
        val path = tmp(d, "nation_permissive")
        Csv.write(Tables.nation(s, d), path)
        // append a file of malformed lines (wrong arity / bad types)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(path, "bad.csv"),
          "n_nationkey,n_name,n_regionkey\nnot_an_int,BROKEN,9\n777,SHORT_ROW\n")
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "n_nationkey INT, n_name STRING, n_regionkey INT")
        // materialize before touching _corrupt_record: with column
        // pruning the parser only parses projected fields, so
        // corruption in an unprojected field would go undetected
        // (documented Spark caveat — this forces one full-row parse).
        // localCheckpoint, not cache(): CacheManager pins cached plans
        // until an explicit unpersist a lazily-returned query can never
        // issue; checkpoint blocks are ContextCleaner-reclaimed.
        val df = Csv.readPermissive(s, path, schema).localCheckpoint()
        df.agg(count(lit(1)).as("n_total"),
          count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("n_nationkey"))
            .cast("long")).as("key_sum"))
      }),

    // CSV dialect options: semicolon delimiter, quoted fields, custom
    // escape — the knobs real-world CSV interchange needs beyond the
    // reference's pandas defaults. Round-trips text WITH the delimiter
    // embedded in values, so quoting is actually exercised.
    Q("src_csv_options",
      Some("""SELECT c_custkey, c_name || ';' || c_mktsegment AS packed
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val path = tmp(d, "customer_csv_options")
        Tables.customer(s, d)
          .select(col("c_custkey"),
            concat(col("c_name"), lit(";"), col("c_mktsegment")).as("packed"))
          .write.mode("overwrite")
          .option("header", "true").option("sep", ";").option("quote", "\"")
          .csv(path)
        s.read
          .option("header", "true").option("sep", ";").option("quote", "\"")
          .csv(path)
          .select(col("c_custkey").cast("long"), col("packed"))
          .orderBy("c_custkey")
      }),

    // S3 — catalog table scans (src_jdbc parity; models.py:8-35).
    Q("catalog_users",
      Some(s"""SELECT c_custkey AS id, c_name AS username,
              |       sha256(concat(c_name, ':', 'pw')) AS password,
              |       ${Catalog.DefaultCreatedAt} AS created_at
              |FROM customer ORDER BY id""".stripMargin),
      (s, d) => Catalog.users(s, d).orderBy("id")),

    // S3-JDBC — the catalog behind a LIVE JDBC database (reference
    // db.py:12-14 keeps users/jobs in Postgres; this is the
    // spark.read.jdbc / df.write.jdbc code path, exercised against
    // embedded Derby because the sandbox has no network). Round-trips
    // a deterministic users table through the database and returns the
    // read-back rows — oracle-exact, not just rows-only, because the
    // derivation is pure and the JDBC type mapping preserves it.
    Q("catalog_users_jdbc",
      Some(s"""SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS username,
              |       sha256(concat(n_name, ':', 'pw')) AS password,
              |       ${Catalog.DefaultCreatedAt} AS created_at
              |FROM nation ORDER BY id""".stripMargin),
      (s, d) => {
        val url = s"jdbc:derby:${tmp(d, "derby_catalog")};create=true"
        val users = Tables.nation(s, d).select(
          col("n_nationkey").cast("long").as("id"),
          col("n_name").as("username"),
          graft.functions.Exprs.hashPassword(lit("pw"), col("n_name"))
            .as("password"),
          expr(Catalog.DefaultCreatedAt).as("created_at"))
        val store = new graft.pipeline.JdbcCatalog(s, url)
        store.writeUsers(users)
        store.readUsers().orderBy("id")
      }),

    Q("catalog_jobs",
      Some("""SELECT o_orderkey AS id,
             |       concat('file_', o_orderkey, '.csv') AS filename,
             |       CASE o_orderstatus WHEN 'F' THEN 'Completed'
             |            WHEN 'O' THEN 'Pending' ELSE 'Processing' END AS status,
             |       CASE WHEN o_orderstatus = 'F'
             |            THEN concat('s3://processed/processed_file_', o_orderkey, '.csv')
             |            ELSE NULL END AS result_url,
             |       o_orderdate AS upload_time,
             |       o_custkey AS user_id
             |FROM orders ORDER BY id""".stripMargin),
      (s, d) => Catalog.jobs(s, d).orderBy("id")),

    // MERGE/upsert into the catalog: updates batch = all pending jobs
    // completed + one new job row (id -1). Oracle replays the merge in SQL.
    Q("catalog_merge",
      Some("""SELECT id, status FROM (
             |  SELECT o_orderkey AS id,
             |         CASE o_orderstatus WHEN 'O' THEN 'Completed'
             |              WHEN 'F' THEN 'Completed' ELSE 'Processing' END AS status
             |  FROM orders
             |  UNION ALL SELECT -1, 'Pending') t
             |ORDER BY id""".stripMargin),
      (s, d) => {
        val jobs = Catalog.jobs(s, d)
        val newRow = s.range(1).select(
          lit(-1L).as("id"), lit("new_file.csv").as("filename"),
          lit("Pending").as("status"), lit(null).cast("string").as("result_url"),
          expr(Catalog.DefaultCreatedAt).as("upload_time"), lit(0L).as("user_id"))
        val updates = Catalog.completePendingJobs(
          jobs.filter(col("status") === "Pending")).unionByName(newRow)
        Catalog.mergeJobs(jobs, updates)
          .select("id", "status").orderBy("id")
      }),

    // S4 — relational update parity (app.py:177-179): complete all
    // pending jobs, filling result_url.
    Q("catalog_job_update",
      Some("""SELECT o_orderkey AS id,
             |       CASE o_orderstatus WHEN 'P' THEN 'Processing'
             |            ELSE 'Completed' END AS status,
             |       CASE WHEN o_orderstatus = 'F'
             |            THEN concat('s3://processed/processed_file_', o_orderkey, '.csv')
             |            WHEN o_orderstatus = 'O'
             |            THEN concat('s3://processed/processed_file_', o_orderkey, '.csv')
             |            ELSE NULL END AS result_url
             |FROM orders ORDER BY id""".stripMargin),
      (s, d) => Catalog.completePendingJobs(Catalog.jobs(s, d))
        .select("id", "status", "result_url").orderBy("id"))
  )
}
