package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the embedding corpus — the
  * memory-compression half of the FAISS IVF-PQ structure, completing
  * the ANN ladder (brute → label-IVF → kmeans-IVF → SRP → PQ-ADC).
  * Reference scope: the reference app has no vector ops at all
  * (`etl_core.py:22-76` is row-wise text ETL); this is the [EXT]
  * similarity-search surface mandated by BASELINE.json's north_star.
  *
  * Each 64-dim vector splits into M=4 contiguous 16-dim subvectors;
  * each subspace trains its own K=4-centroid codebook (one seeded
  * Lloyd iteration, same recipe as [[Clustering]]) and every vector is
  * encoded as M one-byte codes — a 64-float row becomes 4 codes, the
  * 16× (here; 64× at production K=256, d=8) compression that lets a
  * 100 TB embedding corpus' index live in executor memory. Query-time
  * ADC (asymmetric distance computation): the query builds an M×K
  * table of exact subspace distances to every codebook centroid, and
  * each vector's approximate distance is the sum of M table lookups —
  * no per-vector float math at all.
  *
  * Determinism contract (same as [[Clustering]]): coordinates quantize
  * to the shifted 1e-7 integer grid ([[Clustering.quantize]] — ONE
  * spelling), every distance / centroid mean / ADC sum is exact
  * integer arithmetic (sums that scale with corpus size are widened to
  * DECIMAL(38,0) BEFORE accumulating — the 64-bit width cliff sits at
  * ~2.5e3 vectors for the distortion sum), and all argmins break ties
  * on the code id. Bit-identical across partitionings and engines.
  *
  * Scale shape: codebooks are fixed-cardinality (M·K·16 = 256 rows —
  * broadcast by POLICY, the one frame class the r9 hint sweep kept);
  * training and encoding are one groupBy each over the exploded dims
  * (map-side partial sums); ADC is a broadcast lookup-join against the
  * M×K query table plus one aggregation — the scan never touches the
  * raw vectors after encoding. Top-k is TakeOrderedAndProject.
  */
object Pq {

  val M = 4      // subspaces
  val Dsub = 16  // dims per subspace (64-dim corpus)
  val K = 4      // codes per subspace

  /** Exploded exact-grid dims with their subspace: (vec_id, sub, i, v). */
  private[sim] def dims(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        posexplode(Clustering.quantize(col("embedding"))))
      .select(col("vec_id"),
        expr(s"CAST(pos div $Dsub AS BIGINT)").as("sub"),
        col("pos").as("i"), col("col").as("v"))

  /** Nearest codebook entry per (vector, subspace): exact squared-L2
    * over the subspace's dims, ties to the lowest code id. Per-row d2
    * tops out at Dsub·(1.5e7)² ≈ 3.6e15 — inside long. `cents` is the
    * fixed 256-row codebook (broadcast by policy). */
  private def assign(d: DataFrame, cents: DataFrame): DataFrame =
    d.join(broadcast(cents), Seq("sub", "i"))
      .groupBy("vec_id", "sub", "j")
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("d2"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("d2"), col("j"))).as("m"))
      .select(col("vec_id"), col("sub"),
        col("m").getField("j").as("code"), col("m").getField("d2").as("d2"))

  /** Codebook + per-vector codes, memoized per (session, corpus):
    * seeds = the K lowest vec_ids' own subvectors, one Lloyd update
    * (exact decimal sums → truncating-division means, the
    * subtract-remainder spelling), then encode against the updated
    * codebook. Both queries below read the same materialization. */
  def codebookAndCodes(emb: DataFrame): (DataFrame, DataFrame) =
    pqMemo.getOrCompute(emb, (M, K)) {
      // `d` feeds four subtrees of the ONE-TIME build (seed join,
      // first assign, mean update, encode), so the explode re-runs per
      // subtree — the same trade [[Clustering.kmeansFull]] makes:
      // re-scanning a column-pruned parquet projection beats pinning
      // |corpus|·64 exploded longs, and the memoized OUTPUT (codes +
      // 256-row codebook) is what every query-time consumer reads.
      val d = dims(emb)
      val seeds = emb.orderBy("vec_id").limit(K)
        .withColumn("j",
          (row_number().over(Window.orderBy("vec_id")) - 1).cast("long"))
        .select("vec_id", "j")
      val init = d.join(broadcast(seeds), "vec_id")
        .select(col("sub"), col("j"), col("i"), col("v").as("cv"))
      val a1 = assign(d, init)
      // exact mean per (sub, code, dim): corpus-scaling sum widened to
      // decimal BEFORE accumulating; the mean itself fits long (grid
      // coordinates are ≤ 1.5e7)
      val cent2 = d.join(a1.select(col("vec_id"), col("sub"),
            col("code").as("j")), Seq("vec_id", "sub"))
        .groupBy("sub", "j", "i")
        .agg(sum(col("v").cast("decimal(38,0)")).as("s"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("j"), col("i"),
          expr("CAST((s - s % n) div n AS BIGINT)").as("cv"))
      (cent2, assign(d, cent2))
    }

  private val pqMemo =
    new graft.plans.PlanMemo[(Int, Int), (DataFrame, DataFrame)](
      v => Seq(v._1, v._2))

  /** Encodes `emb` against a FROZEN codebook frame (sub, j, i, cv) —
    * the delta path of the persisted PQ index ([[PqIndex]]): pure
    * assignment, no Lloyd update, no training-corpus re-read. The
    * codebook is fixed-cardinality (M·K·Dsub = 256 rows), broadcast
    * inside [[assign]], so delta encode is one scan of the delta. */
  def encodeAt(emb: DataFrame, cents: DataFrame): DataFrame =
    assign(dims(emb), cents)

  /** ADC top-k: (rank, vec_id, label, approx_d2) by ascending
    * approximate distance to the lowest-id query vector (excluded from
    * the candidates), ties on vec_id. approx_d2 ≤ M·3.6e15 — exact in
    * long, so it is REPORTED (unlike raw cosines, which are
    * engine-noisy and never output — see SimQueries' header). */
  def topK(emb: DataFrame, k: Int): DataFrame = {
    val (cent, codes) = codebookAndCodes(emb)
    adcTopK(emb, cent, codes, k)
  }

  /** IVF-PQ — the full FAISS structure: the kmeans coarse quantizer
    * ([[Clustering.kmeansFull]], shared with cluster_kmeans /
    * sim_topk_ivf_kmeans) routes the query to its `nprobe` nearest
    * cells ([[Similarity.probeCells]] — the ONE probe spelling), and
    * ADC runs only over the probed cells' members. At 100 TB this is
    * the operating point: the scan touches |corpus|·nprobe/kCells
    * code rows, none of the raw vectors. */
  def topKIvfPq(emb: DataFrame, k: Int, kClusters: Int,
      nprobe: Int): DataFrame = {
    val (assigned, kcents) = Clustering.kmeansFull(emb, kClusters)
    val cells = Similarity.probeCells(emb, kcents, nprobe)
    val cand = assigned.select("vec_id", "cluster")
      .join(broadcast(cells), Seq("cluster")).select("vec_id")
    val (cent, codes) = codebookAndCodes(emb)
    adcTopK(emb, cent, codes.join(cand, "vec_id"), k)
  }

  /** The shared ADC ranking: exact M×K query-to-codebook distance
    * table (≤16 rows, broadcast) → per-vector lookup-sum over the
    * given code rows → TakeOrderedAndProject top-k, ties on vec_id,
    * query vector excluded. Also the SERVING path of the persisted PQ
    * index (pq_index_query): `emb` supplies only the query vector and
    * the label lookup — cent/codes can come straight from the
    * artifact, and the scan never touches raw vectors. */
  private[graft] def adcTopK(emb: DataFrame, cent: DataFrame, codes: DataFrame,
      k: Int): DataFrame = {
    val q1 = Similarity.queryVector(emb).select("q_id")
    val qd = dims(emb)
      .join(broadcast(q1), col("vec_id") === col("q_id"))
      .join(broadcast(cent), Seq("sub", "i"))
      .groupBy("sub", "j")
      .agg(sum((col("v") - col("cv")) * (col("v") - col("cv"))).as("qd2"))
    val top = codes
      .join(broadcast(qd), codes("sub") === qd("sub") &&
        codes("code") === qd("j"))
      .groupBy("vec_id").agg(sum("qd2").as("approx_d2"))
      .crossJoin(broadcast(q1)).filter(col("vec_id") =!= col("q_id"))
      .select("vec_id", "approx_d2")
      .orderBy(col("approx_d2"), col("vec_id")).limit(k)
    top.join(emb.select("vec_id", "label"), "vec_id")
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("approx_d2"), col("vec_id"))).cast("long"))
      .select("rank", "vec_id", "label", "approx_d2")
      .orderBy("rank")
  }

  /** Exact-grid L2 top-k — the gold standard [[recallReport]] prices
    * ADC against: the SAME metric (squared L2 on the shifted 1e-7
    * integer grid) computed from the UNCOMPRESSED vectors, so the
    * recall number isolates quantization loss — not a metric mismatch
    * (a cosine gold standard would conflate the two). Per-dim squared
    * difference ≤ (3e7)² = 9e14, ×64 dims ≈ 5.8e16 — inside long.
    * One broadcast + one scan + TakeOrderedAndProject, ties on
    * vec_id. */
  def exactL2TopK(emb: DataFrame, k: Int): DataFrame = {
    graft.plans.GraftFunctions.register(emb.sparkSession)
    val q = broadcast(emb.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("q_id"),
        Clustering.quantize(col("embedding")).as("q_v")))
    val d2 = call_function("l2sq_longs",
      Clustering.quantize(col("embedding")), col("q_v"))
    emb.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .select(col("vec_id"), d2.as("gd2"))
      .orderBy("gd2", "vec_id").limit(k)
  }

  /** Recall@k of the PQ-compressed scan against the exact same-metric
    * search — the number a FAISS user reads next to a PQ index (the
    * companion [[distortion]] gives the distance-space error; this
    * gives the RANKING error). Both id lists are engine-deterministic
    * (exact integer distances, ties on vec_id), so the report is
    * hash-exact, not a float estimate. Cost: the gold standard is one
    * corpus scan (not all-pairs — single query), the PQ side rides
    * the memoized codebook. */
  def recallReport(emb: DataFrame, k: Int = 10): DataFrame = {
    // the e6 fixed-point recall multiplies by 1e6/k — a k that does
    // not divide 1e6 would truncate SILENTLY here while the oracle's
    // rendered multiplier truncates separately, desyncing the two
    // without a wrong-looking number anywhere (the advisor's r12
    // finding); fail loudly instead
    require(1000000 % k == 0, s"recall@k requires k | 1e6, got $k")
    val gold = exactL2TopK(emb, k).select("vec_id")
    val pq = topK(emb, k).select("vec_id")
    gold.join(pq, "vec_id")
      .agg(count(lit(1)).cast("long").as("n_common"))
      .select(lit(k.toLong).as("k"), col("n_common"),
        (col("n_common") * (1000000L / k)).cast("long").as("recall_e6"))
  }

  /** Per-subspace quantization distortion — the quality metric PQ
    * indexes ship with (how much ADC distances deviate from exact):
    * (sub, n, avg_d2) with the average as an exact truncating division
    * of the decimal-widened distortion sum. */
  def distortion(emb: DataFrame): DataFrame = {
    val (_, codes) = codebookAndCodes(emb)
    codes.groupBy("sub")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("d2").cast("decimal(38,0)")).as("s"))
      .select(col("sub"), col("n"),
        expr("CAST((s - s % n) div n AS BIGINT)").as("avg_d2"))
      .orderBy("sub")
  }
}
