package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-22 operators: flatline (stuck-value) detection and the
  * Zipf power-law fit over term frequencies.
  */
object Extras24 {

  def queries: Seq[Q] = Seq(
    // stuck-sensor detection: maximal runs where consecutive readings
    // stay in the SAME alert band (value quantized to tens — exact
    // cent values never repeat in continuous data, bands do), runs of
    // length ≥ 3 reported with their span. The banded flatline is the
    // classic silent ingestion failure signature. One shuffle on the
    // series key carries the lag, the island id, and the reduction.
    Q("ts_flatline",
      Some("""WITH l AS (SELECT user_id, event_id, ts,
             |             CAST(round(value / 10) AS BIGINT) AS c,
             |             lag(CAST(round(value / 10) AS BIGINT))
             |               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |           FROM events),
             |b AS (SELECT user_id, event_id, ts, c,
             |        CASE WHEN prev IS NULL OR c <> prev THEN 1 ELSE 0 END AS brk
             |      FROM l),
             |g AS (SELECT user_id, event_id, ts, c,
             |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                       ROWS UNBOUNDED PRECEDING) AS grp
             |      FROM b)
             |SELECT user_id, CAST(grp AS BIGINT) AS run_id, c AS stuck_band,
             |       CAST(count(*) AS BIGINT) AS run_len,
             |       min(ts) AS run_start, max(ts) AS run_end
             |FROM g GROUP BY 1, 2, 3 HAVING count(*) >= 3
             |ORDER BY user_id, run_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"),
            expr("CAST(round(value / 10) AS BIGINT)").as("c"))
          .withColumn("prev", lag("c", 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("c") =!= col("prev"), 1).otherwise(0))
          .withColumn("grp", sum("brk").over(run))
          .groupBy(col("user_id"), col("grp").cast("long").as("run_id"),
            col("c").as("stuck_band"))
          .agg(count(lit(1)).cast("long").as("run_len"),
            min("ts").as("run_start"), max("ts").as("run_end"))
          .filter(col("run_len") >= 3)
          .orderBy("user_id", "run_id")
      }),

    // Zipf power-law fit: regress ln(corpus frequency) on ln(rank)
    // over the full vocabulary — the slope is the Zipf exponent corpus
    // scientists quote. Both logs are µ-rounded integers BEFORE the
    // closed-form least-squares (products ride DECIMAL(38,0)/HUGEINT),
    // so the fit is bit-identical across engines. Rank is total-ordered
    // (cf desc, term) — tie-proof.
    Q("text_zipf_fit",
      Some("""WITH tok AS (SELECT unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY 1),
             |r AS (SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY cf DESC, term)
             |                              AS DOUBLE)) * 1e6) AS BIGINT) AS x6,
             |             CAST(round(ln(CAST(cf AS DOUBLE)) * 1e6) AS BIGINT) AS y6
             |      FROM cf),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
             |             CAST(sum(CAST(x6 AS HUGEINT) * y6) AS DOUBLE) AS sxy,
             |             CAST(sum(CAST(x6 AS HUGEINT) * x6) AS DOUBLE) AS sxx
             |      FROM r)
             |SELECT n,
             |       CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |            / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             |            * 1e6) AS BIGINT) AS slope_e6,
             |       CAST(round((CAST(sy AS DOUBLE)
             |            - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             |              / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
             |            / n) AS BIGINT) AS intercept_e6
             |FROM g""".stripMargin),
      (s, d) => {
        val tf = graft.text.TokenStats.docTermFreq(Tables.documents(s, d))
        val cf = tf.groupBy("term").agg(sum("tf").cast("long").as("cf"))
        // global (cf DESC, term) rank via ScaleRank — an unpartitioned
        // row_number() window would sort the ENTIRE vocabulary (Heaps'
        // law: billions of distinct terms at 100 TB) in one task, the
        // single-partition shape ScaleRank exists to remove; the
        // range-bucketed rank is the identical total order
        val r = ScaleRank
          .withGlobalRank(cf, "cf", "term", descending = true)
          .select(
            expr("CAST(round(ln(CAST(rk AS DOUBLE)) * 1e6) AS BIGINT)").as("x6"),
            expr("CAST(round(ln(CAST(cf AS DOUBLE)) * 1e6) AS BIGINT)").as("y6"))
        r.agg(count(lit(1)).cast("long").as("n"),
            sum("x6").cast("long").as("sx"), sum("y6").cast("long").as("sy"),
            expr("CAST(sum(CAST(x6 AS DECIMAL(38,0)) * y6) AS DOUBLE)").as("sxy"),
            expr("CAST(sum(CAST(x6 AS DECIMAL(38,0)) * x6) AS DOUBLE)").as("sxx"))
          .select(col("n"),
            expr("""CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   | / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   | * 1e6) AS BIGINT)""".stripMargin).as("slope_e6"),
            expr("""CAST(round((CAST(sy AS DOUBLE)
                   | - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   |   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * sx)
                   | / n) AS BIGINT)""".stripMargin).as("intercept_e6"))
      }))
}
