package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 profiling harness (measurement only — guide §1): decomposes
  * the ingest-stream choreographies into their component walls so the
  * optimization targets the part that actually costs, not the label.
  * Usage: runMain graft.ProfR16 [sfDir]
  */
object ProfR16 {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup

    // warm-up: tables + codegen
    t("warmup") {
      Seq("documents", "embeddings").foreach(n =>
        spark.read.parquet(s"$dir/$n.parquet").foreach(_ => ()))
    }

    // ── text ingest decomposition ────────────────────────────────────
    val docs = graft.io.Tables.documents(spark, dir).select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "prof_ix_").toString
    t("text day0 writeIndex (%4==0)") {
      Dedup.writeIndex(docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", root)
    }
    (1 to 3).foreach { m =>
      val batch = docs.filter(col("doc_id") % 4 === m)
      val ix = t(s"text readIndex day$m") { Dedup.readIndex(spark, root) }
      val accepted = t(s"text probe day$m (accept+materialize)") {
        val a = Dedup.incrementalAcceptIndexed(ix, batch, "doc_id", "text")
        a.write.format("noop").mode("overwrite").save()
        a
      }
      t(s"text appendIndex day$m") {
        Dedup.appendIndex(root, accepted, "doc_id", "text")
      }
    }
    t("text readback") {
      spark.read.parquet(Dedup.ixLive(root))
        .filter(col("id") % 4 =!= 0)
        .select(col("id").as("doc_id"), (col("id") % 4).cast("long").as("day"))
        .orderBy("day", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // ── streaming machinery overhead alone (no-op ingest) ────────────
    t("stream machinery (3-batch no-op drive)") {
      val srcDir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "prof_src_").toString
      (1 to 3).foreach { m =>
        docs.filter(col("doc_id") % 4 === m).limit(10)
          .write.mode("overwrite").parquet(s"$srcDir/d$m.parquet.tmp")
        // single-file day layout like stageArrivals
      }
      // simple: just 3 parquet dirs as files is fine for the file source
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "prof_ckpt_").toString
      val schema = spark.read.parquet(srcDir + "/d1.parquet.tmp").schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir + "/*.tmp")
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // ── emb ingest decomposition ─────────────────────────────────────
    import graft.sim.EmbIndex
    val emb = graft.io.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val eroot = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "prof_eix_").toString
    t("emb day0 writeIndex (%4==0)") {
      EmbIndex.writeIndex(emb.filter(col("vec_id") % 4 === 0), eroot)
    }
    (1 to 3).foreach { m =>
      val batch = emb.filter(col("vec_id") % 4 === m)
      val ix = t(s"emb readIndex day$m") { EmbIndex.readIndex(spark, eroot) }
      val accepted = t(s"emb probe day$m (accept+materialize)") {
        val a = EmbIndex.incrementalAcceptIndexed(ix, batch, 1, 5)
        a.write.format("noop").mode("overwrite").save()
        a
      }
      t(s"emb appendIndex day$m") { EmbIndex.appendIndex(eroot, accepted) }
    }

    // ── pq ingest decomposition ──────────────────────────────────────
    import graft.sim.PqIndex
    val proot = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")), "prof_pix_").toString
    t("pq day0 writeIndex (%4==0)") {
      PqIndex.writeIndex(emb.filter(col("vec_id") % 4 === 0), proot)
    }
    (1 to 3).foreach { m =>
      t(s"pq appendIndex day$m") {
        PqIndex.appendIndex(proot, emb.filter(col("vec_id") % 4 === m))
      }
    }

    spark.stop()
    println("""{"metric":"prof","value":0}""")
  }
}
