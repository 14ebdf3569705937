package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave-9 operators: corpus cross-entropy scoring, market
  * concentration (HHI), gaps-and-islands streaks, inter-arrival gap
  * statistics, dead-letter row routing, and the Mann-Whitney U rank
  * test. Same float policy as the prior waves: exact integer
  * accumulators everywhere; any double appears once, in one
  * closed-form expression shared verbatim with the DuckDB oracle.
  */
object Extras12 {

  def queries: Seq[Q] = Seq(
    // per-document unigram cross-entropy against the corpus language
    // model — the "perplexity filter" of pretraining pipelines, exact:
    // each (doc, term) contributes round(tf/dl · ln(N/cf) · 1e6), and
    // the per-doc total sums those BIGINTs (associative — partial
    // aggregation order can never perturb it). One token explode feeds
    // tf; dl and cf are reductions OF tf (no second explode); the
    // corpus total broadcasts.
    Q("text_cross_entropy",
      Some("""WITH tok AS (SELECT doc_id,
             |              unnest(string_split_regex(lower(trim(text)), ' +')) AS term
             |            FROM documents),
             |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |       FROM tok GROUP BY 1, 2),
             |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
             |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
             |nq AS (SELECT CAST(sum(cf) AS BIGINT) AS n FROM cf)
             |SELECT tf.doc_id, dl.dl,
             |       CAST(sum(CAST(round(CAST(tf.tf AS DOUBLE) / dl.dl
             |            * ln(CAST(nq.n AS DOUBLE) / cf.cf) * 1e6) AS BIGINT)) AS BIGINT)
             |         AS xent_e6
             |FROM tf JOIN dl USING (doc_id) JOIN cf USING (term), nq
             |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val tf = graft.text.TokenStats.docTermFreq(Tables.documents(s, d))
          .select(col("doc_id"), col("term"), col("tf").cast("long").as("tf"))
        val dl = tf.groupBy("doc_id").agg(sum("tf").cast("long").as("dl"))
        val cf = tf.groupBy("term").agg(sum("tf").cast("long").as("cf"))
        val nq = cf.agg(sum("cf").cast("long").as("n"))
        tf.join(dl, "doc_id").join(cf, "term").crossJoin(broadcast(nq))
          .groupBy("doc_id", "dl")
          .agg(sum(expr("""CAST(round(CAST(tf AS DOUBLE) / dl
                          | * ln(CAST(n AS DOUBLE) / cf) * 1e6) AS BIGINT)""".stripMargin))
            .cast("long").as("xent_e6"))
          .orderBy("doc_id")
      }),

    // Herfindahl-Hirschman concentration of supplier revenue within
    // each nation: Σ shareᵢ² from exact cent totals. The fact reduces
    // once to (nation, supplier) revenue; the second reduction carries
    // Σrev² on DECIMAL(38,0)/HUGEINT (1000× revenue cannot overflow);
    // one double division per nation at the end.
    Q("agg_hhi",
      Some("""WITH r AS (SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
             |             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
             |           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |           GROUP BY 1, 2),
             |g AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_sup,
             |             CAST(sum(rev) AS BIGINT) AS tot,
             |             CAST(sum(CAST(rev AS HUGEINT) * rev) AS DOUBLE) AS sumsq
             |      FROM r GROUP BY 1)
             |SELECT nk, n_sup, tot,
             |       CAST(round(sumsq / (CAST(tot AS DOUBLE) * tot) * 1e6) AS BIGINT) AS hhi_e6
             |FROM g ORDER BY nk""".stripMargin),
      (s, d) => {
        // supplier SCALES with the corpus — no pinned broadcast;
        // stats/AQE broadcast it while it fits (SCALE.md r9 policy)
        val r = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk"), col("l_suppkey").as("sk"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("long").as("rev"))
        r.groupBy("nk")
          .agg(count(lit(1)).cast("long").as("n_sup"),
            sum("rev").cast("long").as("tot"),
            expr("CAST(sum(CAST(rev AS DECIMAL(38,0)) * rev) AS DOUBLE)").as("sumsq"))
          .select(col("nk"), col("n_sup"), col("tot"),
            expr("CAST(round(sumsq / (CAST(tot AS DOUBLE) * tot) * 1e6) AS BIGINT)")
              .as("hhi_e6"))
          .orderBy("nk")
      }),

    // longest strictly-increasing streak of order totals per customer —
    // gaps-and-islands: break flags → running group id → run lengths →
    // max. Everything integer; one shuffle on the customer key carries
    // all four steps (the windows and the final reduce share it).
    Q("window_streak",
      Some("""WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok, o_orderdate AS dt,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS p
             |           FROM orders),
             |l AS (SELECT ck, ok, dt, p,
             |        lag(p) OVER (PARTITION BY ck ORDER BY dt, ok) AS prev FROM o),
             |b AS (SELECT ck, ok, dt,
             |        CASE WHEN prev IS NULL OR p <= prev THEN 1 ELSE 0 END AS brk FROM l),
             |g AS (SELECT ck, ok,
             |        sum(brk) OVER (PARTITION BY ck ORDER BY dt, ok
             |                       ROWS UNBOUNDED PRECEDING) AS grp FROM b),
             |r AS (SELECT ck, grp, CAST(count(*) AS BIGINT) AS run_len
             |      FROM g GROUP BY 1, 2)
             |SELECT ck, CAST(max(run_len) AS BIGINT) AS longest_streak,
             |       CAST(sum(run_len) AS BIGINT) AS n_orders
             |FROM r GROUP BY ck ORDER BY ck""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("ck").orderBy("dt", "ok")
        val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
            col("o_orderdate").as("dt"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("p"))
          .withColumn("prev", lag("p", 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull || col("p") <= col("prev"), 1).otherwise(0))
          .withColumn("grp", sum("brk").over(wr))
          .groupBy("ck", "grp").agg(count(lit(1)).cast("long").as("run_len"))
          .groupBy("ck")
          .agg(max("run_len").cast("long").as("longest_streak"),
            sum("run_len").cast("long").as("n_orders"))
          .orderBy("ck")
      }),

    // inter-arrival gap statistics per user in EXACT microseconds
    // (epoch-µs lag deltas — the dq_freshness time base): min/max are
    // exact integers, the mean is one rounded division. The lag window
    // and the reduction share one shuffle on user_id.
    Q("ts_gap_stats",
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) AS us,
             |             lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |                                     ORDER BY ts, event_id) AS prev
             |           FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |       CAST(min(us - prev) AS BIGINT) AS min_gap_us,
             |       CAST(max(us - prev) AS BIGINT) AS max_gap_us,
             |       CAST(round(CAST(sum(us - prev) AS DOUBLE) / count(*)) AS BIGINT)
             |         AS avg_gap_us
             |FROM g WHERE prev IS NOT NULL
             |GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag("us", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("gap", col("us") - col("prev"))
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n_gaps"),
            min("gap").cast("long").as("min_gap_us"),
            max("gap").cast("long").as("max_gap_us"),
            expr("CAST(round(CAST(sum(gap) AS DOUBLE) / count(*)) AS BIGINT)")
              .as("avg_gap_us"))
          .orderBy("user_id")
      }),

    // dead-letter routing: rows failing any quality rule land in a
    // reject table WITH their machine-readable reason list (fixed rule
    // order, comma-joined — concat_ws skips the NULL non-failures in
    // both engines identically). Map-side only: no shuffle at any
    // scale; the good-row side is the same scan minus the filter.
    Q("pipeline_dead_letter",
      Some("""SELECT doc_id, lang, n_chars,
             |       concat_ws(',',
             |         CASE WHEN n_chars < 60 THEN 'too_short' END,
             |         CASE WHEN lang NOT IN ('en','es','de','fr') THEN 'unsupported_lang' END,
             |         CASE WHEN right(trim(text), 1) <> '.' THEN 'no_sentence_end' END)
             |         AS reasons
             |FROM documents
             |WHERE n_chars < 60 OR lang NOT IN ('en','es','de','fr')
             |   OR right(trim(text), 1) <> '.'
             |ORDER BY doc_id""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .withColumn("reasons", concat_ws(",",
          when(col("n_chars") < 60, "too_short"),
          when(!col("lang").isin("en", "es", "de", "fr"), "unsupported_lang"),
          when(expr("right(trim(text), 1)") =!= ".", "no_sentence_end")))
        .filter(col("reasons") =!= "")
        .select("doc_id", "lang", "n_chars", "reasons")
        .orderBy("doc_id")),

    // Mann-Whitney U between two segments' balances, exactly: ranks of
    // the pooled sample with tie-averaging carried as DOUBLED ranks
    // (2·rank + ties − 1 is always an integer), so U×2 is an exact
    // BIGINT — no float rank arithmetic at all. U₁+U₂ = n₁·n₂ is the
    // built-in self-check. Scale shape: the engine never ranks ROWS —
    // it reduces to one row per distinct VALUE (per-segment tie
    // counts), takes the running pooled count from ScaleRank's
    // range-partitioned prefix sums, and folds each value's doubled-
    // rank contribution algebraically: every row of value v has
    // 2·rank + tc − 1 = 2·cum + tc + 1 where cum = rows strictly
    // below v. Identical integers to the oracle's per-row window.
    Q("stat_mann_whitney",
      Some("""WITH v AS (SELECT c_mktsegment AS seg,
             |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
             |           FROM customer
             |           WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')),
             |r AS (SELECT seg, v,
             |        CAST(rank() OVER (ORDER BY v) AS BIGINT) AS rk,
             |        CAST(count(*) OVER (PARTITION BY v) AS BIGINT) AS tc
             |      FROM v),
             |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(2 * rk + tc - 1) AS BIGINT) AS r2 FROM r GROUP BY 1)
             |SELECT a.n AS n1, b.n AS n2,
             |       CAST(a.r2 - a.n * (a.n + 1) AS BIGINT) AS u1_x2,
             |       CAST(b.r2 - b.n * (b.n + 1) AS BIGINT) AS u2_x2
             |FROM (SELECT * FROM g WHERE seg = 'AUTOMOBILE') a
             |CROSS JOIN (SELECT * FROM g WHERE seg = 'HOUSEHOLD') b""".stripMargin),
      (s, d) => {
        val v = Tables.customer(s, d)
          .filter(col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
          .select(col("c_mktsegment").as("seg"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("v"))
        val pv = v.groupBy("v").agg(
            count(when(col("seg") === "AUTOMOBILE", 1)).cast("long").as("cA"),
            count(when(col("seg") === "HOUSEHOLD", 1)).cast("long").as("cH"))
          .withColumn("tc", col("cA") + col("cH"))
        val ranked = ScaleRank.withGlobalRank(pv, "v", "v",
            runOn = Some("tc"), runName = "cumIncl")
          .withColumn("contrib", lit(2) * (col("cumIncl") - col("tc"))
            + col("tc") + 1)
        ranked.agg(
            sum(col("cA")).cast("long").as("n1"),
            sum(col("cH")).cast("long").as("n2"),
            sum(col("cA") * col("contrib")).cast("long").as("ra"),
            sum(col("cH") * col("contrib")).cast("long").as("rb"))
          .select(col("n1"), col("n2"),
            expr("CAST(ra - n1 * (n1 + 1) AS BIGINT)").as("u1_x2"),
            expr("CAST(rb - n2 * (n2 + 1) AS BIGINT)").as("u2_x2"))
      }))
}
