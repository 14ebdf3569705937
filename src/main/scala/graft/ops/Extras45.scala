package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-43 operators: embedding-centroid drift and the
  * Wald–Wolfowitz runs test.
  */
object Extras45 {

  def queries: Seq[Q] = Seq(
    // centroid drift per label: L2 distance between the mean embedding
    // of the even-id half and the odd-id half of each label's vectors
    // — the "did this class move" check run when a corpus is refreshed.
    // Components quantize to 1e-4 ints, and the difference of means
    // clears denominators ((sa·nb − sb·na), common denominator na·nb),
    // so the squared-distance sum is EXACT integer arithmetic
    // (DECIMAL(38,0)) until one final sqrt — deterministic across
    // engines. One posexplode + one (label, pos) reduction; partial
    // aggregation absorbs the dimension fan-out map-side.
    Q("emb_centroid_shift",
      Some("""WITH n AS (SELECT label,
             |    CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS na,
             |    CAST(count(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS nb
             |  FROM embeddings GROUP BY 1),
             |q AS (SELECT vec_id, label,
             |        CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e4)
             |             AS BIGINT) AS v,
             |        unnest(range(len(embedding))) AS pos
             |      FROM embeddings),
             |d AS (SELECT label, pos,
             |        CAST(coalesce(sum(v) FILTER (WHERE vec_id % 2 = 0), 0) AS BIGINT) AS sa,
             |        CAST(coalesce(sum(v) FILTER (WHERE vec_id % 2 = 1), 0) AS BIGINT) AS sb
             |      FROM q GROUP BY 1, 2),
             |x AS (SELECT d.label, n.na, n.nb,
             |        CAST(sum((CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
             |                 * (CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)) AS DOUBLE) AS ss
             |      FROM d JOIN n USING (label) GROUP BY 1, 2, 3)
             |SELECT label, na, nb,
             |       CAST(round(sqrt(ss) / nullif(CAST(na AS DOUBLE) * nb, 0) * 100)
             |            AS BIGINT) AS shift_e6
             |FROM x ORDER BY label""".stripMargin),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val n = emb.groupBy("label").agg(
          count(when(col("vec_id") % 2 === 0, 1)).cast("long").as("na"),
          count(when(col("vec_id") % 2 === 1, 1)).cast("long").as("nb"))
        val q = emb.select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .select(col("vec_id"), col("label"), col("pos"),
            expr("CAST(round(CAST(x AS DOUBLE) * 1e4) AS BIGINT)").as("v"))
        val dd = q.groupBy("label", "pos").agg(
          coalesce(sum(when(col("vec_id") % 2 === 0, col("v"))), lit(0L))
            .cast("long").as("sa"),
          coalesce(sum(when(col("vec_id") % 2 === 1, col("v"))), lit(0L))
            .cast("long").as("sb"))
        dd.join(broadcast(n), "label")
          .groupBy("label", "na", "nb")
          // widen BEFORE multiplying (sa ~ na·1e4, so sa·nb crosses
          // 2⁶³ near 3e7 vectors per label half)
          .agg(expr("""CAST(sum((CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)
                      | * (CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na)) AS DOUBLE)"""
            .stripMargin).as("ss"))
          .select(col("label"), col("na"), col("nb"),
            // nullif: a one-parity label (single-vector label) has
            // na·nb = 0 and an undefined shift — NULL in both engines,
            // never a NaN whose long cast the engines disagree on
            expr("""CAST(round(sqrt(ss) / nullif(CAST(na AS DOUBLE) * nb, 0) * 100)
                   | AS BIGINT)""".stripMargin).as("shift_e6"))
          .orderBy("label")
      }),

    // Wald–Wolfowitz runs test: is each user's up/down move sequence
    // random, or does it trend/oscillate? Signs come from one lag
    // window, runs from a second lag over the zero-free sign sequence
    // (both windows share the same user-hash sort), and everything
    // stays exact integers until the closing z formula. Users with
    // one-sided or degenerate sequences are excluded (variance 0).
    Q("stat_runs_test",
      Some("""WITH s AS (SELECT user_id, ts, event_id,
             |    sign(CAST(round(value * 100) AS BIGINT)
             |         - lag(CAST(round(value * 100) AS BIGINT))
             |           OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS sg
             |  FROM events),
             |nz AS (SELECT user_id, ts, event_id, sg,
             |         lag(sg) OVER (PARTITION BY user_id
             |                       ORDER BY ts, event_id) AS prev
             |       FROM s WHERE sg IS NOT NULL AND sg <> 0),
             |g AS (SELECT user_id,
             |        CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |        CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |        CAST(1 + sum(CASE WHEN prev IS NOT NULL AND sg <> prev
             |                          THEN 1 ELSE 0 END) AS BIGINT) AS runs
             |      FROM nz GROUP BY 1)
             |SELECT user_id, n1, n2, runs,
             |       CAST(round((runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2))
             |            * sqrt((n1 + n2 - 1.0)
             |                   / (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)))
             |            * 1e6) AS BIGINT) AS z_e6
             |FROM g
             |WHERE n1 > 0 AND n2 > 0 AND 2 * n1 * n2 > n1 + n2
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sg = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .withColumn("sg", signum(col("c") - lag("c", 1).over(w)).cast("int"))
          .filter(col("sg").isNotNull && col("sg") =!= 0)
        val g = sg.withColumn("prev", lag("sg", 1).over(w))
          .groupBy("user_id")
          .agg(sum(when(col("sg") === 1, 1).otherwise(0)).cast("long").as("n1"),
            sum(when(col("sg") === -1, 1).otherwise(0)).cast("long").as("n2"),
            (sum(when(col("prev").isNotNull && col("sg") =!= col("prev"), 1)
              .otherwise(0)) + 1).cast("long").as("runs"))
        // z = num·√((n−1)/vnum) with num and vnum EXACT integers — the
        // only float ops are one divide, one sqrt, one multiply, each
        // exactly-rounded IEEE, so both engines hit the same bits.
        g.filter(col("n1") > 0 && col("n2") > 0 &&
            col("n1") * col("n2") * 2 > col("n1") + col("n2"))
          .select(col("user_id"), col("n1"), col("n2"), col("runs"),
            expr("""CAST(round((runs * (n1 + n2) - 2 * n1 * n2 - (n1 + n2))
                   | * sqrt((n1 + n2 - 1.0)
                   |        / (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)))
                   | * 1e6) AS BIGINT)""".stripMargin).as("z_e6"))
          .orderBy("user_id")
      }))
}
