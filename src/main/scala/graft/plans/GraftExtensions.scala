package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

/** Registration for the engine's native Catalyst expressions.
  *
  * Two paths:
  *  - [[GraftFunctions.register]] — per-session, idempotent; what the
  *    registered queries use.
  *  - [[GraftExtensions]] — `SparkSessionExtensions` hook for
  *    production sessions:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftFunctions {
  val Functions: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "minhash_signature" -> (exprs => MinHashSignature(exprs.head)),
    "shingles" -> (exprs => Shingles(exprs.head)),
    // cap must be a foldable literal (it sizes aggregation buffers);
    // the analyzer wraps the bare AggregateFunction itself
    "capped_collect_longs" -> (exprs => CappedCollectLongs(exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue)))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    Functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** cosine_sim as a Column (requires register(spark) on the session
    * that analyzes the plan). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val exprClass = Map(
    "cosine_sim" -> classOf[CosineSimilarity].getName,
    "minhash_signature" -> classOf[MinHashSignature].getName,
    "shingles" -> classOf[Shingles].getName,
    "capped_collect_longs" -> classOf[CappedCollectLongs].getName)

  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.Functions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(exprClass(name), name),
        builder))
    }
}
