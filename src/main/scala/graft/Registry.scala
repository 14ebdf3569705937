package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query.
  *
  * @param name   stable key (SURVEY.md §2 operator key)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables (None → driver records a rows-only check)
  * @param fn     the Spark implementation: (session, sf dir) => result
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Registry {
  /** All query groups, assembled by SparkEntry. Order matters only for
    * readability of CORRECTNESS reports. */
  def all: Seq[Q] =
    graft.ops.Relational.queries ++
      graft.ops.Aggregates.queries ++
      graft.ops.Windows.queries ++
      graft.ops.Joins.queries ++
      graft.ops.SqlSurface.queries ++
      graft.ops.Scale.queries ++
      graft.ops.Extras.queries ++
      graft.ops.Extras2.queries ++
      graft.ops.Extras3.queries ++
      graft.ops.Extras4.queries ++
      graft.ops.Extras5.queries ++
      graft.ops.Extras6.queries ++
      graft.ops.Extras7.queries ++
      graft.ops.Extras8.queries ++
      graft.ops.Extras9.queries ++
      graft.ops.Extras10.queries ++
      graft.ops.Extras11.queries ++
      graft.ops.Extras12.queries ++
      graft.ops.Extras13.queries ++
      graft.ops.Extras14.queries ++
      graft.ops.Extras15.queries ++
      graft.ops.Extras16.queries ++
      graft.ops.Extras17.queries ++
      graft.ops.Extras18.queries ++
      graft.ops.Extras19.queries ++
      graft.ops.Extras20.queries ++
      graft.ops.Extras21.queries ++
      graft.ops.Extras22.queries ++
      graft.ops.Extras23.queries ++
      graft.ops.Extras24.queries ++
      graft.ops.Extras25.queries ++
      graft.ops.Extras26.queries ++
      graft.ops.Extras27.queries ++
      graft.ops.Extras28.queries ++
      graft.ops.Extras29.queries ++
      graft.ops.Extras30.queries ++
      graft.ops.Extras31.queries ++
      graft.ops.Extras32.queries ++
      graft.ops.Extras33.queries ++
      graft.ops.Extras34.queries ++
      graft.ops.Extras35.queries ++
      graft.ops.Extras36.queries ++
      graft.ops.Extras37.queries ++
      graft.ops.Extras38.queries ++
      graft.ops.Extras39.queries ++
      graft.ops.Extras40.queries ++
      graft.ops.Extras41.queries ++
      graft.ops.Extras42.queries ++
      graft.ops.Extras43.queries ++
      graft.ops.Extras44.queries ++
      graft.ops.Extras45.queries ++
      graft.ops.Extras46.queries ++
      graft.ops.Extras47.queries ++
      graft.ops.Extras48.queries ++
      graft.ops.Extras49.queries ++
      graft.ops.Extras50.queries ++
      graft.ops.Extras51.queries ++
      graft.ops.Analytics.queries ++
      graft.ops.Typed.queries ++
      graft.io.IoQueries.queries ++
      graft.io.HealthQueries.queries ++
      graft.functions.ExprQueries.queries ++
      graft.functions.ExprQueries2.queries ++
      graft.text.TextQueries.queries ++
      graft.text.DedupQueries.queries ++
      graft.sim.SimQueries.queries ++
      graft.sim.EmbIndexQueries.queries ++
      graft.sim.PqIndexQueries.queries ++
      graft.multimodal.MultimodalQueries.queries ++
      graft.pipeline.PipelineQueries.queries ++
      graft.streaming.StreamQueries.queries
}
