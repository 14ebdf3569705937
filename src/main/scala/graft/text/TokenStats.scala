package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped materialization of the (doc, term, tf) frequency
  * table over the canonical tokenization (lower → trim → split ' +').
  * Four registered consumers (TF-IDF, BM25, cross-entropy, vocabulary)
  * derive every statistic they need — document length, document
  * frequency, corpus frequency — as exact aggregates OF this table, so
  * sharing it changes no value anywhere while running the token
  * explode (the text family's dominant cost) once per corpus instead
  * of once per query. The persisted payload is |distinct (doc, term)|
  * rows — far smaller than the exploded token stream it replaces.
  */
object TokenStats {

  private val memo =
    new graft.plans.PlanMemo[(String, String), DataFrame](Seq(_))

  def docTermFreq(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    memo.getOrCompute(docs, (idCol, textCol)) {
      docs.select(col(idCol),
          explode(split(lower(trim(col(textCol))), " +")).as("term"))
        .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    }
}
