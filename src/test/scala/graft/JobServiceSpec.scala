package graft

import graft.pipeline.JobService

/** End-to-end control-plane flow: the reference's API surface
  * (register → login → upload → start ETL → job history) driven
  * against the engine. */
class JobServiceSpec extends SparkSpec {
  import spark.implicits._

  test("register/login/startEtl/listJobs full flow incl. failure path") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_test_jobsvc_${System.nanoTime()}"
    val svc = new JobService(spark, s"$base/catalog")

    // register + uniqueness probe (app.py:83)
    assert(svc.register("alice", "s3cret"))
    assert(!svc.register("alice", "other"))
    assert(svc.register("bob", "hunter2"))

    // login + hash verify (app.py:97-109)
    assert(svc.login("alice", "s3cret"))
    assert(!svc.login("alice", "wrong"))
    assert(!svc.login("nobody", "x"))

    // upload + ETL job (app.py:141-189)
    val in = s"$base/upload/reviews.csv"
    Seq(("great fast product", 5), ("slow broken thing", 1))
      .toDF("review", "rating").write.option("header", "true").csv(in)
    val jobId = svc.startEtl("alice", in, s"$base/processed/reviews.csv")
    val job = svc.jobs.filter($"id" === jobId).collect().head
    assert(job.getAs[String]("status") == "Completed")
    assert(job.getAs[String]("result_url") != null)

    // a failing job is recorded as Failed, not thrown (etl_core.py:79)
    val badId = svc.startEtl("bob", s"$base/nonexistent.csv", s"$base/out2")
    val bad = svc.jobs.filter($"id" === badId).collect().head
    assert(bad.getAs[String]("status") == "Failed")
    assert(bad.getAs[String]("result_url") == null)

    // history listing: desc order, 5 projected cols, formatted ts
    val listed = svc.listJobs().collect()
    assert(listed.length == 2)
    assert(listed.head.getAs[Long]("id") == badId) // newest first
    assert(listed.head.schema.fieldNames.toSeq ==
      Seq("id", "filename", "status", "result_url", "upload_time"))
    assert(listed.head.getAs[String]("upload_time")
      .matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"))

    // the processed output has the enrichment column
    val out = graft.io.Csv.read(spark, s"$base/processed/reviews.csv")
    assert(out.columns.contains("sentiment_result"))
    assert(out.count() == 2)
  }
}
