package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-arithmetic k-means over embedding vectors.
  *
  * Floating-point k-means is not reproducible across engines (or even
  * across partitionings — double sums are order-dependent). This
  * implementation quantizes each coordinate to a 1e-7 integer grid
  * (floats carry ~7 significant digits, so the grid is below the data's
  * own precision), shifts positive, and then runs Lloyd iterations in
  * pure BIGINT arithmetic: distances are exact integer sums, centroid
  * means are exact floor-divisions. Every step is associative and
  * order-independent → the distributed result is bit-identical to a
  * single-threaded run (and to the DuckDB oracle).
  *
  * Scale design: centroids (k×dims longs) broadcast; assignment is an
  * embarrassingly-parallel scan (one fused zip_with/aggregate pass per
  * vector×centroid); the update is one shuffle keyed on (cluster, dim)
  * with map-side partial sums. Iterations are driver-controlled — the
  * classic broadcast-join Lloyd loop, the same structure MLlib uses.
  */
object Clustering {

  private val Offset = 10000000L // shifts [-0.53, 0.46]·1e7 positive

  /** Quantize a float-array column to the shifted 1e-7 integer grid. */
  def quantize(emb: Column): Column =
    transform(emb, e => round(e * 1e7).cast("long") + Offset)

  /** Assign each vector to its nearest centroid (squared L2 in exact
    * BIGINT; ties break to the lowest cluster id). */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    // r16: native fused L2² kernel (graft.plans.L2SqLongs) — the k×d
    // per-vector distance scan is this family's hot loop; bit-identical
    // to the zip_with/aggregate fold it replaces.
    graft.plans.GraftFunctions.register(vecs.sparkSession)
    val d2 = call_function("l2sq_longs", col("v"), col("c"))
    vecs.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("j"), d2.as("d2"))
      .groupBy("vec_id")
      .agg(min(struct(col("d2"), col("j"))).as("m"), first(col("v")).as("v"))
      .select(col("vec_id"), col("m").getField("j").as("cluster"),
        col("m").getField("d2").as("dist2"), col("v"))
  }

  /** Recompute centroids as exact truncating-division means per
    * dimension: (s − s % n) is exactly divisible, and the division
    * runs as INTEGRAL `div` — `/` is double division, which rounds
    * once the per-cluster sum passes 2⁵³ (a ~6e8-member cluster at
    * this grid), where the long cast would truncate to a different
    * grid unit than the oracle's CAST rounds to. The collect_list
    * buffer re-assembling the centroid is one (pos, cv) struct per
    * DIMENSION (64) — bounded by dimensionality, not rows. */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .withColumn("cv", expr("(s - s % n) div n"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("c"))
      .select(col("cluster").as("j"), col("c"))

  /** Two Lloyd iterations from a deterministic seed (the k lowest
    * vec_ids). Returns (final assignments (vec_id, cluster, dist2, v),
    * final centroids (j, c)) — both in exact grid units. */
  def kmeansFull(emb: DataFrame, k: Int): (DataFrame, DataFrame) =
    kmeansMemo.getOrCompute(emb, k) {
      val vecs = emb.select(col("vec_id"), quantize(col("embedding")).as("v"))
      val init = vecs.orderBy("vec_id").limit(k)
        .withColumn("j",
          (row_number().over(Window.orderBy("vec_id")) - 1).cast("long"))
        .select(col("j"), col("v").as("c"))
      val a1 = assign(vecs, init)
      val c2 = update(a1)
      (assign(vecs, c2), c2)
    }

  /** Session-scoped memo: cluster_kmeans and the IVF-kmeans probe both
    * run the SAME Lloyd iterations; materialize assignments + centroids
    * once (k×dims longs + one row per vector — small). Plan identity is
    * sameResult-confirmed; entries evict on session end (PlanMemo). */
  private val kmeansMemo =
    new graft.plans.PlanMemo[Int, (DataFrame, DataFrame)](
      v => Seq(v._1, v._2))

  /** Assign each embedding to its nearest FROZEN centroid frame
    * (j, c) — the routing half of a persisted IVF structure
    * ([[PqIndex]]): pure assignment, no Lloyd update, the coarse twin
    * of [[Pq.encodeAt]]. One scan of `emb` against the broadcast
    * ≤k-row centroid table. */
  def assignAt(emb: DataFrame, cents: DataFrame): DataFrame =
    assign(emb.select(col("vec_id"), quantize(col("embedding")).as("v")),
      cents).select("vec_id", "cluster")

  /** Assignment-only view: (vec_id, cluster, dist2), dist2 in squared
    * grid units, exact. */
  def kmeans(emb: DataFrame, k: Int): DataFrame =
    kmeansFull(emb, k)._1
      .select(col("vec_id"), col("cluster"), col("dist2")).orderBy("vec_id")
}
