package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CRASH MATRIX for the nightly maintenance pass (`maintainIndex`,
  * all four index families) — the Ab evidence harness behind
  * [[graft.io.MaintenanceReport]]'s crash contract.
  *
  * For each family the harness stages the SAME damaged scenario
  * (a replayed/torn append + pending erasure tombstones + the
  * family's regeneration trigger condition where one exists) into a
  * fresh root per crash point, then:
  *
  *   - crash point k ∈ {0 = before anything, 1 = after COMPACT,
  *     2 = after COMPACT+REPAIR}: runs the first k steps manually
  *     (each step is individually crash-safe, so "crashed between
  *     steps" IS the state a real crash leaves), then one full
  *     `maintainIndex` — the re-run a scheduler issues after the
  *     crash;
  *   - asserts the final live-artifact CONTENT is identical to the
  *     uncrashed (k = 0) pass's — healing is path-independent;
  *   - asserts a further pass reports a three-way no-op.
  *
  * Output: one line per family with the uncrashed report and the
  * matrix verdict. Run: `runMain graft.MaintainAb <sfDir>`. */
object MaintainAb {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.io.MaintenanceReport

    /** Runs the matrix for one family given (damage-stager, the
      * manual step runners, the full pass, the content reader). */
    def matrix(family: String, stage: String => Unit,
        compactStep: String => Unit, repairStep: String => Unit,
        pass: String => MaintenanceReport,
        content: String => DataFrame): Unit = {
      var ref: Seq[String] = null
      var refReport: MaintenanceReport = null
      (0 to 2).foreach { k =>
        val root = tmp(s"graft_maintab_${family}_k${k}_")
        stage(root)
        if (k >= 1) compactStep(root)
        if (k >= 2) repairStep(root)
        val rep = pass(root)
        val got = rows(content(root))
        if (k == 0) { ref = got; refReport = rep }
        else require(got == ref,
          s"$family crash point $k: healed content diverged from the " +
            s"uncrashed pass (${got.size} vs ${ref.size} rows)")
        val again = pass(root)
        require(again.noop,
          s"$family crash point $k: second pass not a no-op ($again)")
      }
      println(s"[maintain-ab] family=$family crash_matrix=PASS " +
        s"report=(compacted=${refReport.compacted}," +
        s"repaired=${refReport.repaired}," +
        s"regen=${refReport.regenerated.map(r =>
          r.substring(r.lastIndexOf('/') + 1)).getOrElse("none")}) " +
        s"noop_verified=true")
    }

    // ── text MinHash ────────────────────────────────────────────────
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val textSource = docs.filter(col("doc_id") % 10 =!= 1)
    matrix("text",
      stage = { root =>
        import graft.text.Dedup
        Dedup.writeIndex(docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", root)
        Dedup.appendIndex(root,
          docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text")
        // the replayed append: one slice lands end-to-end TWICE
        Dedup.appendIndex(root,
          docs.filter(col("doc_id") % 20 === 5), "doc_id", "text")
        Dedup.eraseFromIndex(root,
          docs.filter(col("doc_id") % 10 === 1)
            .select(col("doc_id").as("id")))
      },
      compactStep = root =>
        graft.text.Dedup.compactIndexStats(spark, root),
      repairStep = root => { graft.text.Dedup.repairIndex(spark, root); () },
      pass = root => graft.text.Dedup.maintainIndex(spark, root,
        textSource, "doc_id", "text", denseAt = 100),
      content = root => spark.read.parquet(graft.text.Dedup.ixLive(
          graft.io.ModelGens.liveRoot(root)))
        .select(col("id"), size(col("sh")).as("n_sh"), col("fp"),
          size(col("bands")).as("n_bands")))

    // ── embedding bands ─────────────────────────────────────────────
    val emb = graft.io.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val embSource = emb.filter(col("vec_id") % 10 =!= 1)
    matrix("emb",
      stage = { root =>
        import graft.sim.EmbIndex
        EmbIndex.writeIndex(emb.filter(col("vec_id") % 20 === 0), root,
          maxBucket = 4)
        EmbIndex.appendIndex(root, emb.filter(col("vec_id") % 20 =!= 0))
        EmbIndex.appendIndex(root, emb.filter(col("vec_id") % 20 === 5))
        EmbIndex.eraseFromIndex(root,
          emb.filter(col("vec_id") % 10 === 1).select("vec_id"))
      },
      compactStep = root =>
        graft.sim.EmbIndex.compactIndexStats(spark, root),
      repairStep = root => { graft.sim.EmbIndex.repairIndex(spark, root); () },
      pass = root =>
        graft.sim.EmbIndex.maintainIndex(spark, root, embSource),
      content = root => spark.read.parquet(
          graft.sim.EmbIndex.vecsLive(graft.io.ModelGens.liveRoot(root)))
        .select(col("vec_id"), col("na"),
          col("bands").getItem(0).getField("mask"),
          col("bands").getItem(1).getField("mask")))

    // ── PQ codes ────────────────────────────────────────────────────
    matrix("pq",
      stage = { root =>
        import graft.sim.{Clustering, Pq, PqIndex}
        PqIndex.writeIndex(emb.filter(col("vec_id") <= 15), root)
        PqIndex.appendIndex(root, emb.filter(col("vec_id") > 15))
        // the torn retry: 2 of 4 subspaces of one slice land again —
        // the slice is DISJOINT from the erased population, so repair
        // never needs an erased vector's raw embedding
        val slice = emb.filter(col("vec_id") % 10 === 3)
        val live = PqIndex.codesLive(root)
        Pq.encodeAt(slice, spark.read.parquet(s"$root/codebook"))
          .filter(col("sub") < 2)
          .join(Clustering.assignAt(slice,
              spark.read.parquet(s"$root/coarse"))
            .select(col("vec_id"), col("cluster").as("cell")), "vec_id")
          .write.partitionBy("cell").mode("append").parquet(live)
        spark.catalog.refreshByPath(live)
        PqIndex.eraseFromIndex(root,
          emb.filter(col("vec_id") % 10 === 1).select("vec_id"))
      },
      compactStep = root => graft.sim.PqIndex.compactIndex(spark, root),
      repairStep = root =>
        { graft.sim.PqIndex.repairIndex(spark, root, embSource); () },
      pass = root =>
        graft.sim.PqIndex.maintainIndex(spark, root, embSource),
      content = root => spark.read.parquet(
          graft.sim.PqIndex.codesLive(root))
        .select("vec_id", "sub", "code", "d2"))

    // ── media signatures ────────────────────────────────────────────
    val media = graft.multimodal.Multimodal.synthMediaTable(spark,
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text", "n_chars")).localCheckpoint()
    matrix("mm",
      stage = { root =>
        import graft.multimodal.MmIndex
        MmIndex.writeIndex(media.filter(col("doc_id") % 5 =!= 0), root)
        val delta = media.filter(col("doc_id") % 5 === 0)
        MmIndex.appendIndex(root, delta)
        MmIndex.appendIndex(root, delta) // the replay
        MmIndex.eraseFromIndex(root,
          media.filter(col("doc_id") % 10 === 1).select("doc_id"))
      },
      compactStep = root => graft.multimodal.MmIndex.compactIndex(spark, root),
      repairStep = root =>
        { graft.multimodal.MmIndex.repairIndex(spark, root); () },
      pass = root => graft.multimodal.MmIndex.maintainIndex(spark, root),
      content = root => spark.read.parquet(
          graft.multimodal.MmIndex.sigLive(root))
        .select("doc_id", "media_type", "phash_hi", "phash_lo"))

    spark.stop()
  }
}
