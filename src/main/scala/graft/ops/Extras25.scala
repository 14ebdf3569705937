package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-23 operators: DAU/MAU stickiness and dormancy flags.
  */
object Extras25 {

  def queries: Seq[Q] = Seq(
    // stickiness = avg DAU / MAU per month — the product-health ratio.
    // Exact: both numerators are counts over distinct activity sets
    // (user,day) and (user,month); avg DAU = Σ daily actives / days
    // observed in the month; one rounded division at the end.
    Q("analytics_stickiness",
      Some("""WITH d AS (SELECT DISTINCT user_id,
             |             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             |             CAST(date_trunc('month', ts) AS TIMESTAMP) AS mon
             |           FROM events),
             |dau AS (SELECT mon, day, CAST(count(*) AS BIGINT) AS dau
             |        FROM d GROUP BY 1, 2),
             |mau AS (SELECT mon, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
             |        FROM d GROUP BY 1),
             |a AS (SELECT mon, CAST(sum(dau) AS BIGINT) AS dau_total,
             |             CAST(count(*) AS BIGINT) AS n_days
             |      FROM dau GROUP BY 1)
             |SELECT a.mon, a.dau_total, a.n_days, mau.mau,
             |       CAST(round(CAST(a.dau_total AS DOUBLE) / a.n_days / mau.mau * 1e6)
             |         AS BIGINT) AS stickiness_e6
             |FROM a JOIN mau USING (mon) ORDER BY mon""".stripMargin),
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
            date_trunc("month", col("ts")).as("mon"))
          .distinct()
        val dau = act.groupBy("mon", "day")
          .agg(count(lit(1)).cast("long").as("dau"))
        val mau = act.groupBy("mon")
          .agg(countDistinct("user_id").cast("long").as("mau"))
        val a = dau.groupBy("mon")
          .agg(sum("dau").cast("long").as("dau_total"),
            count(lit(1)).cast("long").as("n_days"))
        a.join(mau, "mon")
          .select(col("mon"), col("dau_total"), col("n_days"), col("mau"),
            expr("""CAST(round(CAST(dau_total AS DOUBLE) / n_days / mau * 1e6)
                   | AS BIGINT)""".stripMargin).as("stickiness_e6"))
          .orderBy("mon")
      }),

    // dormancy: exact days since each user's last activity, measured
    // against the corpus high-water mark; dormant = silent > 14 days.
    // One reduction per user; the global max broadcasts.
    Q("ts_dormancy",
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             |u AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY 1)
             |SELECT u.user_id, u.last_ts,
             |       CAST(date_diff('day', CAST(u.last_ts AS DATE), CAST(m.mx AS DATE))
             |            AS BIGINT) AS days_silent,
             |       CAST(date_diff('day', CAST(u.last_ts AS DATE), CAST(m.mx AS DATE)) > 14
             |            AS BOOLEAN) AS dormant
             |FROM u CROSS JOIN m ORDER BY user_id""".stripMargin),
      (s, d) => {
        val ev = Tables.events(s, d)
        val m = ev.agg(max(col("ts")).as("mx"))
        ev.groupBy("user_id").agg(max(col("ts")).as("last_ts"))
          .crossJoin(broadcast(m))
          .select(col("user_id"), col("last_ts"),
            datediff(to_date(col("mx")), to_date(col("last_ts")))
              .cast("long").as("days_silent"),
            (datediff(to_date(col("mx")), to_date(col("last_ts"))) > 14)
              .as("dormant"))
          .orderBy("user_id")
      }))
}
