package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) interval builder — the CDC shape
  * of the reference's job-status history (models.py keeps only the
  * latest status; a warehouse keeps every version with validity
  * intervals). Classic gaps-and-islands: detect attribute changes with
  * lag, number the islands with a running sum, collapse each island to
  * one version row, close it with the next version's start.
  *
  * Scale: both window passes partition by the entity key, so the work
  * is one shuffle on `key` shared by every window (Catalyst reuses the
  * sort/exchange), then a per-key linear scan — no self-join, no
  * driver-side state. Skewed keys are bounded by per-entity history
  * length, not table size.
  */
object Scd {

  /** One row per (key, consecutive-attribute run): key, version (1-based
    * per key), the attribute value, valid_from/valid_to (valid_to NULL =
    * current), n_events collapsed into the version. `tie` breaks equal
    * timestamps deterministically. */
  def buildScd2(df: DataFrame, key: Column, attr: Column, ts: Column,
      tie: Column): DataFrame = {
    val byTime = Window.partitionBy(key).orderBy(ts, tie)
    // null-safe: mirrors the oracles' `lag(attr) IS DISTINCT FROM attr`
    // exactly. The old `isNull || =!=` spelling diverged on NULL
    // attributes (x→NULL never opened a version — =!= yields NULL —
    // while NULL→NULL opened one per row); the helper is generic over
    // CDC attributes, so the nullable case is part of its contract.
    val changed = !(lag(attr, 1).over(byTime) <=> attr)
    val versioned = df.select(
      key.as("key"), attr.as("attr"), ts.as("ts"),
      sum(when(changed, 1L).otherwise(0L)).over(byTime).as("version"))
    val byVersion = Window.partitionBy(col("key")).orderBy(col("version"))
    versioned
      .groupBy(col("key"), col("version"))
      .agg(min(col("attr")).as("attr"), // constant within the island
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
      .select(col("key"), col("version"), col("attr"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }
}
