package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-13 operators: sentence segmentation, star-except
  * projection, ORDER BY ALL, and the null-safe equality join.
  */
object Extras16 {

  def queries: Seq[Q] = Seq(
    // sentence segmentation: documents explode to (doc, idx, sentence)
    // on terminal punctuation followed by whitespace — the corpus unit
    // between token and document that sentence-level filters and
    // chunkers consume. posexplode keeps the order; empty tails from a
    // trailing terminator are dropped structurally.
    // (RE2 in DuckDB has no lookbehind, so both engines first mark the
    // boundary — terminator kept, following whitespace replaced by a
    // \x01 marker — then split on the marker; identical row sets.)
    Q("text_sentences",
      Some("""WITH m AS (SELECT doc_id,
             |  string_split(regexp_replace(text, '([.!?])[ \t\n\r\f]+', '\1' || chr(1), 'g'),
             |               chr(1)) AS ss
             |  FROM documents)
             |SELECT doc_id,
             |       CAST(generate_subscripts(ss, 1) - 1 AS BIGINT) AS sent_idx,
             |       unnest(ss) AS sentence,
             |       CAST(length(unnest(ss)) AS BIGINT) AS n_chars
             |FROM m
             |ORDER BY doc_id, sent_idx""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(
            regexp_replace(col("text"), "([.!?])[ \\t\\n\\r\\f]+", "$1\u0001"),
            "\u0001")))
        .select(col("doc_id"), col("pos").cast("long").as("sent_idx"),
          col("col").as("sentence"),
          length(col("col")).cast("long").as("n_chars"))
        .orderBy("doc_id", "sent_idx")),

    // star-except projection: SELECT * EXCEPT (...) — schema-evolution
    // ergonomics (drop the bulky column, keep everything else) without
    // enumerating the survivors. Map-side; the pruned column never
    // leaves the scan.
    Q("sql_star_except",
      Some("""SELECT * EXCLUDE (text) FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("documents_se")
        s.sql("SELECT * EXCEPT (text) FROM documents_se ORDER BY doc_id")
      }),

    // ORDER BY ALL: total ordering over every projected column in
    // position order — the dialect sugar that makes results
    // deterministic without naming the sort keys.
    Q("sql_order_by_all",
      Some("""SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
             |FROM customer GROUP BY ALL ORDER BY ALL""".stripMargin),
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_oba")
        s.sql("""SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
                |FROM customer_oba GROUP BY ALL ORDER BY ALL""".stripMargin)
      }),

    // null-safe equality join (<=> / IS NOT DISTINCT FROM): delinquent
    // customers get a NULL region bucket on BOTH sides, and the
    // null-safe join matches them — the semantics an ordinary equi-join
    // silently drops. The bucket dimension is 6 rows and broadcasts.
    Q("join_null_safe",
      Some("""WITH c AS (SELECT c_custkey,
             |             CASE WHEN c_acctbal < 0 THEN NULL
             |                  ELSE c_nationkey % 5 END AS bucket
             |           FROM customer),
             |b AS (SELECT DISTINCT CASE WHEN nk < 0 THEN NULL ELSE nk END AS bucket,
             |             CASE WHEN nk < 0 THEN 'DELINQUENT'
             |                  ELSE 'ZONE_' || CAST(nk AS VARCHAR) END AS zone
             |      FROM (SELECT unnest([-1, 0, 1, 2, 3, 4]) AS nk) t)
             |SELECT c.c_custkey, b.zone
             |FROM c JOIN b ON c.bucket IS NOT DISTINCT FROM b.bucket
             |ORDER BY c.c_custkey""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit(null).cast("int"))
            .otherwise(col("c_nationkey") % 5).as("bucket"))
        val b = s.range(-1, 5).select(
          when(col("id") < 0, lit(null).cast("int"))
            .otherwise(col("id").cast("int")).as("bucket"),
          when(col("id") < 0, "DELINQUENT")
            .otherwise(concat(lit("ZONE_"), col("id").cast("string"))).as("zone"))
        c.join(broadcast(b), c("bucket") <=> b("bucket"))
          .select(col("c_custkey"), col("zone"))
          .orderBy("c_custkey")
      }))
}
