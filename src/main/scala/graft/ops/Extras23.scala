package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-21 operators: data-completeness measurement and
  * per-document token entropy.
  */
object Extras23 {

  def queries: Seq[Q] = Seq(
    // data completeness per user: hours-with-data over the hours the
    // series SHOULD span (first→last activity inclusive) — the
    // freshness-adjacent DQ number every ingestion dashboard shows.
    // Slot counts are exact integers (truncated-hour epoch µs divide
    // evenly); one aggregation over the distinct (user, hour) set.
    Q("dq_completeness",
      Some("""WITH h AS (SELECT DISTINCT user_id,
             |             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
             |           FROM events)
             |SELECT user_id,
             |       CAST(count(*) AS BIGINT) AS present_hours,
             |       CAST((epoch_us(max(hr)) - epoch_us(min(hr))) / 3600000000
             |            + 1 AS BIGINT) AS expected_hours,
             |       CAST(round(CAST(count(*) AS DOUBLE) * 1e6
             |            / ((epoch_us(max(hr)) - epoch_us(min(hr))) / 3600000000 + 1))
             |         AS BIGINT) AS completeness_e6
             |FROM h GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .distinct()
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("present_hours"),
          expr("""CAST((unix_micros(max(hr)) - unix_micros(min(hr))) DIV 3600000000
                 | + 1 AS BIGINT)""".stripMargin).as("expected_hours"),
          expr("""CAST(round(CAST(count(*) AS DOUBLE) * 1e6
                 | / ((unix_micros(max(hr)) - unix_micros(min(hr))) DIV 3600000000 + 1))
                 | AS BIGINT)""".stripMargin).as("completeness_e6"))
        .orderBy("user_id")),

    // per-document token entropy H = Σ −(tf/dl)·ln(tf/dl) — the
    // within-document diversity signal (compressibility proxy) next to
    // the corpus-relative cross-entropy. Terms µ-round before the
    // associative sum; everything derives from the shared tf table.
    Q("text_token_entropy",
      Some("""WITH tok AS (SELECT doc_id,
             |              unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1)
             |SELECT tf.doc_id, dl.dl,
             |       CAST(sum(CAST(round(-(CAST(tf.tf AS DOUBLE) / dl.dl)
             |            * ln(CAST(tf.tf AS DOUBLE) / dl.dl) * 1e6) AS BIGINT)) AS BIGINT)
             |         AS entropy_e6
             |FROM tf JOIN dl USING (doc_id)
             |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val tf = graft.text.TokenStats.docTermFreq(Tables.documents(s, d))
        val dl = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
        tf.join(dl, "doc_id")
          .groupBy("doc_id", "dl")
          .agg(sum(expr("""CAST(round(-(CAST(tf AS DOUBLE) / dl)
                          | * ln(CAST(tf AS DOUBLE) / dl) * 1e6) AS BIGINT)"""
            .stripMargin)).cast("long").as("entropy_e6"))
          .orderBy("doc_id")
      }))
}
