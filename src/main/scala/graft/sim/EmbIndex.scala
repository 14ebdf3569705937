package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted band index for the EMBEDDING near-dup family [EXT] — the
  * text MinHash index's production growing-corpus shape
  * ([[graft.text.Dedup.writeIndex]] / appendIndex / readIndex) applied
  * to the banded sign-LSH family: at 100 TB the banded candidate
  * relation is rebuilt from raw vectors once per session (140 s cold
  * at the 100× replica corpus — SERIAL.md), while the production shape
  * is build-once / append-deltas / probe-delta-sized.
  *
  * Three parquet artifacts + a manifest under `root`:
  *
  *  - `vecs` — per-vector record of truth: (vec_id, qe, na, bands)
  *    where `qe` is the 1e-6-grid integer quantization the exact
  *    verify kernel reads, `na` its squared norm, `bands` the two
  *    sign-band keys at the INDEX width. The raw float embedding is
  *    not stored: every downstream consumer (candidate join, exact
  *    threshold verify) reads the integer forms only, so the base
  *    corpus's float vectors are never needed again — the "no raw
  *    vectors after encode" contract of the PQ path, applied to dedup.
  *  - `post` — exploded postings (vec_id, bk): the candidate-join
  *    probe side, persisted so the probe never re-explodes per-vector
  *    band arrays.
  *  - `bk` — per-bucket occupancy (bk, n): the hot-bucket sidecar,
  *    MERGEABLE partials (appends add partial rows; consumers sum).
  *  - `manifest` — one row: (bits, width_clamped, max_bucket, n_base).
  *    The band width is RESOLVED AT BUILD TIME from the indexed
  *    corpus's stats ([[Similarity.resolveWidth]] — the same auto rule
  *    as the in-session banded family) and FROZEN for the index's
  *    lifetime: postings hashed at width w are only probe-compatible
  *    with keys hashed at width w, so appends MUST reuse the manifest
  *    width (one width per generation), and only a REBUILD re-resolves
  *    it from the grown corpus. This is also the growth guard the
  *    in-session count memo cannot give: an append-then-reprobe
  *    session reads the width from the artifact it probes, never from
  *    a count cached before the append.
  *
  * Append crash contract mirrors the text index: the derived artifacts
  * (post, bk partials) land FIRST and `vecs` — the membership record
  * the verify join reads — lands LAST, so a torn append leaves only
  * conservative orphans (postings whose candidates fail the vecs join;
  * bucket partials that make buckets look hotter — the guard's safe
  * direction), recoverable by re-running the append.
  */
object EmbIndex {

  /** An opened index: the three artifact frames + the frozen width. */
  final case class EmbeddingIndex(vecs: DataFrame, postings: DataFrame,
      bucketStats: DataFrame, bits: Int, widthClamped: Boolean,
      maxBucket: Int)

  private def sumLong(c: Column): Column =
    aggregate(c, lit(0L), (s, v) => s + v)

  /** Per-vector index rows at a GIVEN width — one projection pass over
    * the corpus (no join, no shuffle): the 1e-6-grid quantization, its
    * squared norm, and the two sign-band keys. */
  def buildRows(emb: DataFrame, bits: Int): DataFrame = {
    // r16: norms/dots through the native fused kernel (DotLongs) —
    // codegen, no temporary square array; bit-identical fold.
    graft.plans.GraftFunctions.register(emb.sparkSession)
    emb.select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1e6).cast("long")).as("qe"),
        Similarity.signBandKeys(col("embedding"), bits).as("bands"))
      .withColumn("na", call_function("dot_longs", col("qe"), col("qe")))
      .select("vec_id", "qe", "na", "bands")
  }

  /** Probe-side postings derived from a [[buildRows]] frame. */
  def indexPostings(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"), explode(col("bands")).as("bk"))

  /** Per-bucket occupancy — mergeable partial-aggregate semantics
    * (consumers SUM per bucket, so appended partials compose). */
  def indexBucketStats(postings: DataFrame): DataFrame =
    postings.groupBy("bk").agg(count(lit(1)).as("n"))

  /** Builds and persists the full index under `root`, resolving the
    * band width from the indexed corpus's own (count, minDim) — the
    * derived artifacts are re-read from the WRITTEN vecs parquet so
    * the three cannot drift (the text-index derivation contract). */
  def writeIndex(emb: DataFrame, root: String, maxBucket: Int = 100): Unit = {
    val s = emb.sparkSession
    val (n, minDim) = Similarity.corpusStats(emb)
    val (bits, clamped) = Similarity.resolveWidth(n, minDim, maxBucket)
    buildRows(emb, bits).write.mode("overwrite").parquet(s"$root/vecs")
    // derived postings coalesce to size-targeted files (FileSizing,
    // guide §6) — input is the just-written vecs parquet, no kernel
    // work left to serialize; vecs bytes bound post bytes
    val (vFs, vPath) = graft.text.Dedup.hadoopFs(s"$root/vecs")
    val vParts = graft.io.FileSizing.partsFor(
      graft.io.FileSizing.dirBytes(vFs, vPath))
    indexPostings(s.read.parquet(s"$root/vecs")).coalesce(vParts)
      .write.mode("overwrite").parquet(s"$root/post")
    indexBucketStats(s.read.parquet(s"$root/post"))
      .write.mode("overwrite").parquet(s"$root/bk")
    import s.implicits._
    // 1-row manifest; repartition(1) on a local relation carries no
    // upstream compute (the coalesce(1) lesson does not apply)
    Seq((bits, clamped, maxBucket, n))
      .toDF("bits", "width_clamped", "max_bucket", "n_base")
      .repartition(1).write.mode("overwrite").parquet(s"$root/manifest")
  }

  /** The manifest row: (bits, width_clamped, max_bucket, n_base). */
  def readManifest(s: SparkSession, root: String): (Int, Boolean, Int, Long) = {
    val r = s.read.parquet(s"${graft.io.ModelGens.liveRoot(root)}/manifest")
      .select("bits", "width_clamped", "max_bucket", "n_base").head()
    (r.getInt(0), r.getBoolean(1), r.getInt(2), r.getLong(3))
  }

  /** Opens a persisted index written by [[writeIndex]] / grown by
    * [[appendIndex]] / maintained by [[repairIndex]]. The derived
    * artifacts resolve through the generation machinery the text
    * index established ([[graft.text.Dedup.livePath]]: highest
    * `_SUCCESS`-complete generation; the plain dir is generation 0) —
    * including `vecs`, whose generations only ever change content by
    * DEDUPLICATION of retried appends ([[repairIndex]]); appends grow
    * the live generation in place. */
  def readIndex(s: SparkSession, root: String): EmbeddingIndex = {
    val mr = graft.io.ModelGens.liveRoot(root)
    val (bits, clamped, guard, _) = readManifest(s, mr)
    val vecs = s.read.parquet(vecsLive(mr))
    val post = s.read.parquet(graft.text.Dedup.livePath(mr, "post").toString)
    val (v, p) =
      if (graft.text.Dedup.artifactExists(mr, "tomb")) {
        // tombstone-aware open: erased vectors are anti-joined out of
        // the record of truth AND the probe side, so from the erase
        // call onward a tombstoned vector can neither reject a delta
        // nor appear in any probe — physical removal happens at the
        // next [[compactIndexStats]]. Tombstone sets are request-sized
        // (GDPR lists), hence the broadcast hint. The bk sidecar stays
        // UNFILTERED until compaction: occupancy that still counts
        // erased members only over-guards (drops hot buckets sooner) —
        // the conservative direction.
        val tomb = broadcast(s.read.parquet(tombLive(mr)).select("vec_id"))
        (vecs.join(tomb, Seq("vec_id"), "left_anti"),
          post.join(tomb, Seq("vec_id"), "left_anti"))
      } else (vecs, post)
    EmbeddingIndex(v, p,
      s.read.parquet(graft.text.Dedup.livePath(mr, "bk").toString),
      bits, clamped, guard)
  }

  private def tombLive(root: String): String =
    graft.text.Dedup.livePath(
      graft.io.ModelGens.liveRoot(root), "tomb").toString

  /** Top-k SERVING from the persisted band index — the query a
    * vector-store user runs against a loaded index (the band family's
    * [[PqIndex]]-`pq_index_query` counterpart): the 1-row `query`
    * frame is quantized and band-keyed at the MANIFEST width, its two
    * buckets probe the persisted postings for candidates, and ranking
    * is the µ-rounded cosine over the index's INTEGER record of truth
    * (qe/na — raw base vectors are read zero times; the exact-integer
    * dot and norms make the rounded cosine bit-identical across
    * engines, the [[Similarity.hardNegativesBanded]] cos_e6 policy).
    *
    * No hot-bucket guard here, deliberately: the guard exists to stop
    * QUADRATIC pair generation in the dedup probes; a single query's
    * candidate work is LINEAR in the two probed buckets' occupancy,
    * and dropping a hot bucket would only lose recall. At 100 TB the
    * probe reads |bucket| postings + their qe rows — never the
    * corpus. */
  def indexTopK(ix: EmbeddingIndex, query: DataFrame, k: Int): DataFrame = {
    val q = buildRows(query, ix.bits)
      .select(col("vec_id").as("q_id"), col("qe").as("qe_q"),
        col("na").as("na_q"), col("bands").as("q_bands"))
    val qbk = q.select(col("q_id"), explode(col("q_bands")).as("bk"))
    val cand = ix.postings.join(broadcast(qbk), Seq("bk"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("vec_id").distinct()
    ix.vecs.join(cand, Seq("vec_id"))
      .crossJoin(broadcast(q.select("qe_q", "na_q")))
      .filter(col("na") > 0 && col("na_q") > 0)
      .withColumn("dot", call_function("dot_longs", col("qe"), col("qe_q")))
      .withColumn("cos_e6",
        expr("""CAST(round(CAST(dot AS DOUBLE)
               | / sqrt(CAST(na AS DOUBLE) * CAST(na_q AS DOUBLE))
               | * 1e6) AS BIGINT)""".stripMargin))
      .orderBy(col("cos_e6").desc, col("vec_id")).limit(k)
      .select("vec_id", "cos_e6")
  }

  /** Batched top-k serving: every row of `queries` is answered from
    * the persisted artifact in ONE probe plan — the multi-query
    * analogue of [[indexTopK]], shared by stream-serving micro-batches
    * and offline batch scoring. Per query: candidates from its two
    * band buckets at the MANIFEST width, ranked by the µ-rounded
    * cosine over the integer record of truth; the literal rank bound
    * plans a WindowGroupLimit (per-query top-k pruning below the
    * window). The query side is the bounded micro-batch → broadcast;
    * the postings/vecs side streams. */
  def indexTopKBatch(ix: EmbeddingIndex, queries: DataFrame,
      k: Int): DataFrame = {
    val q = buildRows(queries, ix.bits)
      .select(col("vec_id").as("q_id"), col("qe").as("qe_q"),
        col("na").as("na_q"), col("bands").as("q_bands"))
    val qbk = q.select(col("q_id"), explode(col("q_bands")).as("bk"))
    val cand = ix.postings.join(broadcast(qbk), Seq("bk"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    ix.vecs.join(cand, Seq("vec_id"))
      .join(broadcast(q.select("q_id", "qe_q", "na_q")), Seq("q_id"))
      .filter(col("na") > 0 && col("na_q") > 0)
      .withColumn("dot", call_function("dot_longs", col("qe"), col("qe_q")))
      .withColumn("cos_e6",
        expr("""CAST(round(CAST(dot AS DOUBLE)
               | / sqrt(CAST(na AS DOUBLE) * CAST(na_q AS DOUBLE))
               | * 1e6) AS BIGINT)""".stripMargin))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q_id")
          .orderBy(col("cos_e6").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "rank", "vec_id", "cos_e6")
  }

  /** Right-to-erasure INTO the persisted index (the index-side
    * counterpart of pipeline_erasure's lake rewrite): the ids —
    * an EXTERNAL request list, never a frame derived from the index
    * being erased — append to the `tomb` artifact, which every
    * [[readIndex]] open anti-joins out. O(|request|) at erase time;
    * the physical rewrite is deferred to [[compactIndexStats]], where
    * it rides the maintenance pass the sidecar needs anyway. */
  def eraseFromIndex(root: String, ids: DataFrame): Unit =
    graft.text.Dedup.appendTombstones(
      graft.io.ModelGens.liveRoot(root), ids.select(col("vec_id")))

  /** Maintenance pass — the embedding twin of
    * [[graft.text.Dedup.compactIndexStats]], plus tombstone purge:
    *
    *  - ALWAYS: the `bk` sidecar returns to one row per bucket.
    *    Every [[appendIndex]] adds a partial row-set and every probe
    *    sums per bucket, so correctness never degrades — but a
    *    daily-append year leaves ~365 partials per bucket and the
    *    probe-time aggregation pays for the history. Compaction is
    *    the maintenance half of the mergeable-partials contract.
    *  - WHEN TOMBSTONES EXIST: erased vectors are physically removed
    *    from `vecs` and `post` (published as next create-only
    *    generations), `bk` is re-derived from the purged postings
    *    (one row per bucket — compaction implicit), and the tombstone
    *    list is reset LAST — a crash at any point leaves the
    *    tombstones in force and every artifact at some complete
    *    generation, so probes stay erasure-correct throughout.
    *
    * Same single-writer assumption as [[appendIndex]]; results are
    * bit-identical before/after for non-erased data (the probe sums
    * partials either way). The manifest's `n_base` is informational
    * and intentionally untouched — the frozen WIDTH is the contract,
    * and erasure shrinks a corpus, never grows it past the width's
    * density point. */
  def compactIndexStats(s: SparkSession, root0: String): Unit = {
    val root = graft.io.ModelGens.liveRoot(root0)
    val hasTomb = graft.text.Dedup.artifactExists(root, "tomb") &&
      s.read.parquet(tombLive(root)).limit(1).count() > 0
    if (hasTomb) {
      val tomb = s.read.parquet(tombLive(root)).select("vec_id")
        .localCheckpoint() // snapshot: outlives the tomb reset below
      // compaction doubles as the file-hygiene pass (FileSizing,
      // guide §6): purged rewrites coalesce the append-accumulated
      // tiny part files back to size-targeted ones
      val (cFs, _) = graft.text.Dedup.hadoopFs(root)
      def sized(p: String): Int = graft.io.FileSizing.partsFor(
        graft.io.FileSizing.dirBytes(cFs, p))
      val curVecs = vecsLive(root)
      val vecsParts = sized(curVecs)
      graft.text.Dedup.publishNextGen(s, root, "vecs") { sd =>
        s.read.parquet(curVecs)
          .join(broadcast(tomb), Seq("vec_id"), "left_anti")
          .coalesce(vecsParts)
          .write.mode("overwrite").parquet(sd)
      }
      val curPost = graft.text.Dedup.livePath(root, "post").toString
      val postParts = sized(curPost)
      graft.text.Dedup.publishNextGen(s, root, "post") { sd =>
        s.read.parquet(curPost)
          .join(broadcast(tomb), Seq("vec_id"), "left_anti")
          .coalesce(postParts)
          .write.mode("overwrite").parquet(sd)
      }
      graft.text.Dedup.publishNextGen(s, root, "bk") { sd =>
        indexBucketStats(s.read.parquet(
            graft.text.Dedup.livePath(root, "post").toString))
          .write.mode("overwrite").parquet(sd)
      }
      graft.text.Dedup.publishNextGen(s, root, "tomb") { sd =>
        s.range(0).select(col("id").as("vec_id"))
          .write.mode("overwrite").parquet(sd)
      }
    } else {
      val curBk = graft.text.Dedup.livePath(root, "bk").toString
      graft.text.Dedup.publishNextGen(s, root, "bk") { sd =>
        s.read.parquet(curBk).groupBy("bk").agg(sum("n").as("n"))
          .write.mode("overwrite").parquet(sd)
      }
    }
  }

  /** The live `vecs` artifact. Normally the plain build-time dir
    * (generation 0, append-grown in place); [[repairIndex]] publishes
    * a deduplicated NEXT generation when a retried fully-landed
    * append leaves duplicate vec_id rows — so consumers resolve
    * through the same generation machinery as post/bk. */
  private[graft] def vecsLive(root: String): String =
    graft.text.Dedup.livePath(
      graft.io.ModelGens.liveRoot(root), "vecs").toString

  /** Repairs a torn append (the crash-recovery half of the append
    * contract — the text index's [[graft.text.Dedup.repairIndex]]
    * applied to the embedding artifacts). Detection is exact and
    * cheap: the live `post` must hold exactly 2 rows (one per band)
    * per DISTINCT `vecs` vector — a full-outer count compare, one
    * aggregation each side. The only tear [[appendIndex]]'s vecs-last
    * ordering permits is derived rows (post/bk) for vectors absent
    * from `vecs`; on detection both derived artifacts are re-derived
    * from the distinct-by-id `vecs` rows and published as next
    * create-only generations ([[graft.text.Dedup.publishNextGen]] —
    * committer-marker-gated, rename-free, no instant without a live
    * artifact), `bk` from the freshly PUBLISHED postings so the two
    * cannot drift. The double-retry tear (a fully-landed append
    * re-run end-to-end) leaves duplicate vec_id rows in `vecs`
    * itself; repair detects those and publishes a DEDUPLICATED next
    * `vecs` generation (exact copies — lossless) before re-deriving,
    * so direct `vecs` consumers (emb_index_build's content gate)
    * heal too, not just the probe path. Returns true iff a repair
    * was performed; a second call is a detected no-op. */
  def repairIndex(s: SparkSession, root0: String): Boolean = {
    val root = graft.io.ModelGens.liveRoot(root0)
    // The OTHER tear class: a fully-landed append retried end-to-end
    // duplicates a delta's rows in ALL THREE artifacts — post/bk heal
    // below via the count compare, but `vecs` is what emb_index_build
    // and the verify join read, so duplicate vec_id rows there must
    // be physically deduplicated too (they are exact copies —
    // deterministic functions of the embedding — so dropDuplicates by
    // id is lossless). Published as a next create-only generation;
    // the record of truth is never edited in place.
    val dupVecs = s.read.parquet(vecsLive(root))
      .groupBy("vec_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1L).limit(1).count() > 0
    val (rFs, _) = graft.text.Dedup.hadoopFs(root)
    def sized(p: String): Int = graft.io.FileSizing.partsFor(
      graft.io.FileSizing.dirBytes(rFs, p))
    if (dupVecs) {
      val cur = vecsLive(root)
      val vecsParts = sized(cur)
      graft.text.Dedup.publishNextGen(s, root, "vecs") { sd =>
        s.read.parquet(cur).dropDuplicates("vec_id")
          .coalesce(vecsParts)
          .write.mode("overwrite").parquet(sd)
      }
    }
    def vecsDocs = s.read.parquet(vecsLive(root)).dropDuplicates("vec_id")
    val want = vecsDocs.select(col("vec_id")).withColumn("__want", lit(2L))
    val have = s.read
      .parquet(graft.text.Dedup.livePath(root, "post").toString)
      .groupBy("vec_id").agg(count(lit(1)).as("__have"))
    val torn = dupVecs || want.join(have, Seq("vec_id"), "full_outer")
      .filter(col("__want").isNull || col("__have").isNull ||
        col("__want") =!= col("__have"))
      .limit(1).count() > 0
    if (torn) {
      val postParts = sized(vecsLive(root))
      graft.text.Dedup.publishNextGen(s, root, "post") { sd =>
        indexPostings(vecsDocs).coalesce(postParts)
          .write.mode("overwrite").parquet(sd)
      }
      graft.text.Dedup.publishNextGen(s, root, "bk") { sd =>
        indexBucketStats(s.read.parquet(
            graft.text.Dedup.livePath(root, "post").toString))
          .write.mode("overwrite").parquet(sd)
      }
    }
    torn
  }

  /** Appends the accepted delta vectors' index entries AT THE
    * MANIFEST WIDTH — postings hashed at a different width would be
    * probe-incompatible with the index's buckets, so the width is one
    * per generation by construction (re-resolving from the grown
    * count is a REBUILD, not an append; see the manifest contract in
    * the object scaladoc). Delta-sized appends to all three
    * artifacts; the corpus side is never rewritten. The delta's rows
    * snapshot to a scratch parquet first (the lineage cut of
    * [[graft.text.Dedup.appendIndex]] — an accepted frame lazily
    * derived from the index being grown must not re-screen against
    * the half-grown index), and `vecs` — the record of truth — lands
    * LAST (see the crash contract above). */
  def appendIndex(root0: String, accepted: DataFrame): Unit = {
    val s = accepted.sparkSession
    val root = graft.io.ModelGens.liveRoot(root0)
    val (bits, _, _, _) = readManifest(s, root)
    val (fs, r) = graft.text.Dedup.hadoopFs(root)
    val scratch = new org.apache.hadoop.fs.Path(
      r, s".emb_append_${java.util.UUID.randomUUID().toString.take(13)}")
    try {
      val sd = new org.apache.hadoop.fs.Path(scratch, "vecs").toString
      val postLive = graft.text.Dedup.livePath(root, "post").toString
      val bkLive = graft.text.Dedup.livePath(root, "bk").toString
      val vLive = vecsLive(root)
      buildRows(accepted, bits).write.mode("overwrite").parquet(sd)
      // appends read the scratch snapshot back — coalesce to
      // size-targeted part counts (FileSizing, guide §6): a
      // delta-sized append lands ONE file per artifact, not one per
      // core
      val np = graft.io.FileSizing.partsFor(
        graft.io.FileSizing.dirBytes(fs, new org.apache.hadoop.fs.Path(sd)))
      // post/bk are independent derived appends; only `vecs` (the
      // record of truth) must land last — overlap them (guide §2.6;
      // same recurring-path rationale as graft.text.Dedup.appendIndex)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fPost = Future {
        indexPostings(s.read.parquet(sd)).coalesce(np)
          .write.mode("append").parquet(postLive)
      }
      val fBk = Future {
        indexBucketStats(indexPostings(s.read.parquet(sd)))
          .write.mode("append").parquet(bkLive)
      }
      Await.result(fPost, Duration.Inf)
      Await.result(fBk, Duration.Inf)
      s.read.parquet(sd).coalesce(np).write.mode("append").parquet(vLive)
      s.catalog.refreshByPath(postLive)
      s.catalog.refreshByPath(bkLive)
      s.catalog.refreshByPath(vLive)
    } finally fs.delete(scratch, true)
  }

  // ── model generations (occupancy-triggered WIDTH REBUILD) ─────────
  // The band width is sized from the corpus the index was BUILT over
  // (resolveWidth: more vectors → more hyperplanes → bounded bucket
  // occupancy), and appends run at that frozen width by contract —
  // so a corpus that grows far past its build-time count degrades
  // every bucket's occupancy toward the hot-bucket guard. The
  // maintenance is a REBUILD at the width the LIVE count resolves,
  // published as a complete sibling generation under `modelgen<k>`
  // ([[graft.io.ModelGens]] — the PQ codebook refresh's machinery):
  // band keys from two widths never meet in a probe, so a rebuild
  // can no more be an append than a PQ retrain can, and the old
  // generation stays intact for in-flight readers.

  /** Rebuilds the index at the width the CURRENT corpus resolves,
    * publishing it as the next model generation. `source` is the raw
    * embedding corpus (band signs must come from raw floats — the
    * persisted 1e-6 grid rounds sub-grid magnitudes to zero, which
    * flips their sign bit); the live generation's pending TOMBSTONES
    * anti-join it first (the PQ refresh lesson: a rebuild re-derives
    * the per-vector record, and rebuilding from the raw corpus would
    * resurrect erased vectors). Returns the new generation root. */
  def rebuildIndex(s: SparkSession, root: String,
      source: DataFrame): String = {
    val mr = graft.io.ModelGens.liveRoot(root)
    val (_, _, guard, _) = readManifest(s, mr)
    val src =
      if (graft.text.Dedup.artifactExists(mr, "tomb"))
        source.join(broadcast(s.read.parquet(tombLive(mr))
          .select("vec_id")), Seq("vec_id"), "left_anti")
      else source
    val sub = graft.io.ModelGens.nextRoot(root)
    writeIndex(src, sub, guard)
    graft.io.ModelGens.commit(sub)
    sub
  }

  /** The occupancy-triggered rebuild: fires iff the width the LIVE
    * corpus count resolves differs from the manifest's frozen width —
    * the same sizing rule every build uses ([[Similarity
    * .resolveWidth]]), applied to the tombstone-filtered live count,
    * so the trigger is exact, cheap (one count over the served view +
    * a closed form), and quiescent right after a rebuild. Returns the
    * new generation root when it fired. */
  def rebuildIfDegraded(s: SparkSession, root: String,
      source: DataFrame): Option[String] = {
    val mr = graft.io.ModelGens.liveRoot(root)
    val (bits, _, guard, _) = readManifest(s, mr)
    val ix = readIndex(s, mr)
    val nLive = ix.vecs.count()
    // every vector tombstoned → the min-dim aggregate below is null:
    // an empty index has no geometry to re-resolve, so the trigger is
    // an explicit no-op rather than an NPE
    if (nLive == 0) return None
    // minDim from the persisted integer record (array length is
    // rounding-invariant, unlike the sign bits)
    val minDim = ix.vecs.agg(min(size(col("qe")))).head().getInt(0)
    val (want, _) = Similarity.resolveWidth(nLive, minDim, guard)
    if (want != bits) Some(rebuildIndex(s, root, source)) else None
  }

  /** One NIGHTLY MAINTENANCE pass over the embedding band index:
    * compact if tombstones or bucket-stat partials are pending, repair
    * if a torn/replayed append violated the 2-postings-per-vector
    * invariant, rebuild if the live count resolves a different width
    * than the manifest's. Step order / source contract / crash matrix:
    * [[graft.io.MaintenanceReport]] and [[graft.MaintainAb]]. */
  def maintainIndex(s: SparkSession, root: String,
      source: DataFrame): graft.io.MaintenanceReport = {
    val mr = graft.io.ModelGens.liveRoot(root)
    val hasTomb = graft.text.Dedup.artifactExists(mr, "tomb") &&
      s.read.parquet(tombLive(mr)).limit(1).count() > 0
    val hasPartials = s.read.parquet(
        graft.text.Dedup.livePath(mr, "bk").toString)
      .groupBy("bk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).count() > 0
    val doCompact = hasTomb || hasPartials
    if (doCompact) compactIndexStats(s, mr)
    val repaired = repairIndex(s, mr)
    val regen = rebuildIfDegraded(s, root, source)
    graft.io.MaintenanceReport(doCompact, repaired, regen)
  }

  /** The delta's own index rows feed several plan branches (probe,
    * reference union, both verify sides, the final anti-join) —
    * memoized per (session, delta plan, width) and persisted so the
    * quantize/band kernels evaluate once per delta (the text path's
    * deltaIxMemo shape; payload is one row per DELTA vector). */
  private val deltaMemo =
    new graft.plans.PlanMemo[Int, DataFrame](Seq(_))

  /** INCREMENTAL embedding near-dedup against a persisted index — the
    * production shape for a growing corpus: screen the arriving DELTA
    * against the [[writeIndex]] artifact; never re-read (or even
    * re-quantize) the base vectors. A delta vector is rejected iff it
    * verifies cos ≥ num/den (the shared 128-bit-integer kernel,
    * [[Similarity.exactCosAtLeast]]) against ANY indexed vector or a
    * LOWER-id delta vector sharing an unguarded band bucket — the
    * drop-the-higher-member convention of the whole dedup family;
    * rejection is not sequential (a rejected delta vector still
    * blocks its own later near-dups), keeping the result order- and
    * partitioning-independent.
    *
    * Scale shape: candidates come from the delta's postings equi-joined
    * against the PERSISTED postings; hot-bucket stats combine the
    * persisted |buckets|-row sidecar with the delta's own counts (the
    * only probe-time aggregation over index-derived rows); the verify
    * reads the persisted integer qe/na — so the recurring per-delta
    * cost is |delta| × bucket occupancy, never |corpus|², and raw base
    * vectors are touched zero times. */
  def incrementalAcceptIndexed(index: EmbeddingIndex, delta: DataFrame,
      num: Int, den: Int): DataFrame = {
    val dIx = deltaMemo.getOrCompute(delta, index.bits) {
      buildRows(delta, index.bits)
    }
    def deltaBuckets = dIx.select(col("vec_id"), explode(col("bands")).as("bk"))
    // combined occupancy = persisted partials + the delta's counts,
    // identical to grouping index ∪ delta postings without ever
    // re-aggregating the index
    val hot = index.bucketStats.select(col("bk"), col("n"))
      .unionByName(deltaBuckets.groupBy("bk").agg(count(lit(1)).as("n")))
      .groupBy("bk").agg(sum("n").as("__n"))
      .filter(col("__n") > index.maxBucket).select("bk")
    val refBk = index.postings.select(col("vec_id").as("id_ref"), col("bk"),
        lit(true).as("ref_is_base"))
      .unionByName(deltaBuckets.select(col("vec_id").as("id_ref"), col("bk"),
        lit(false).as("ref_is_base")))
    val cand = deltaBuckets.join(refBk.join(hot, Seq("bk"), "left_anti"), "bk")
      .filter(col("ref_is_base") || col("id_ref") < col("vec_id"))
      .select(col("vec_id"), col("id_ref")).distinct()
    val refVecs = index.vecs.select(col("vec_id").as("id_ref"),
        col("qe").as("q_r"), col("na").as("n_r"))
      .unionByName(dIx.select(col("vec_id").as("id_ref"),
        col("qe").as("q_r"), col("na").as("n_r")))
    val rejected = cand
      .join(dIx.select(col("vec_id"), col("qe").as("q_d"), col("na").as("n_d")),
        "vec_id")
      .join(refVecs, "id_ref")
      .withColumn("dot", call_function("dot_longs", col("q_d"), col("q_r")))
      .select(col("vec_id"), col("dot"), col("n_d").as("na"),
        col("n_r").as("nb"))
      .filter(Similarity.exactCosAtLeast(num, den))
      .select("vec_id").distinct()
    delta.join(rejected, Seq("vec_id"), "left_anti")
  }
}
