package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-39 operators: blocked fuzzy (edit-distance) join and
  * Cramér's V association strength.
  */
object Extras41 {

  def queries: Seq[Q] = Seq(
    // fuzzy self-join, block-and-verify: candidate pairs share a cheap
    // blocking key (first name token) and only those pairs pay the
    // O(len²) levenshtein verify — the standard way to keep a fuzzy
    // join off the full cross product (n² → Σ block²). Per part:
    // neighbor count within distance 3 and the closest neighbor
    // (lexicographic struct-min = argmin without a second join); parts
    // with no near-match keep -1 sentinels via the left join back.
    Q("join_fuzzy_blocked",
      Some("""WITH p AS (SELECT p_partkey, p_name,
             |             split_part(p_name, ' ', 1) AS blk
             |           FROM part),
             |m AS (SELECT a.p_partkey AS k,
             |             CAST(count(*) AS BIGINT) AS n_matches,
             |             min(struct_pack(
             |               d := CAST(levenshtein(a.p_name, b.p_name) AS BIGINT),
             |               k2 := b.p_partkey)) AS best
             |      FROM p a JOIN p b
             |        ON a.blk = b.blk AND a.p_partkey <> b.p_partkey
             |      WHERE levenshtein(a.p_name, b.p_name) <= 3
             |      GROUP BY 1)
             |SELECT p.p_partkey,
             |       coalesce(m.n_matches, 0) AS n_matches,
             |       CAST(coalesce(m.best.d, -1) AS BIGINT) AS closest_d,
             |       CAST(coalesce(m.best.k2, -1) AS BIGINT) AS closest_key
             |FROM p LEFT JOIN m ON p.p_partkey = m.k
             |ORDER BY p.p_partkey""".stripMargin),
      (s, d) => {
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"),
          expr("split_part(p_name, ' ', 1)").as("blk"))
        val a = p.select(col("p_partkey").as("k"), col("p_name").as("na"),
          col("blk"))
        val b = p.select(col("p_partkey").as("k2"), col("p_name").as("nb"),
          col("blk"))
        val m = a.join(b, Seq("blk"))
          .filter(col("k") =!= col("k2") &&
            levenshtein(col("na"), col("nb")) <= 3)
          .groupBy("k")
          .agg(count(lit(1)).cast("long").as("n_matches"),
            min(struct(levenshtein(col("na"), col("nb")).cast("long").as("d"),
              col("k2"))).as("best"))
        p.join(m, p("p_partkey") === m("k"), "left")
          .select(col("p_partkey"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"),
            coalesce(col("best.d"), lit(-1L)).as("closest_d"),
            coalesce(col("best.k2"), lit(-1L)).as("closest_key"))
          .orderBy("p_partkey")
      }),

    // Cramér's V: the chi-square association between market segment
    // and order status normalized to [0,1] — "is there ANY dependence
    // and how strong", one row. Same exact-integer contingency shape
    // as stat_chi_square (the 15-cell table + broadcast marginals);
    // the χ² sum and √ normalization happen on the final handful of
    // rows. V = √(χ² / (n·(min(r,c)−1))).
    Q("stat_cramers_v",
      Some("""WITH obs AS (
             |  SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |rt AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS r_tot FROM obs GROUP BY 1),
             |ct AS (SELECT st, CAST(sum(cnt) AS BIGINT) AS c_tot FROM obs GROUP BY 1),
             |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
             |             CAST(count(DISTINCT seg) AS BIGINT) AS r,
             |             CAST(count(DISTINCT st) AS BIGINT) AS c FROM obs),
             |x AS (SELECT t.tot, t.r, t.c,
             |             sum(CAST(CAST(obs.cnt * t.tot - rt.r_tot * ct.c_tot AS HUGEINT)
             |                      * (obs.cnt * t.tot - rt.r_tot * ct.c_tot) AS DOUBLE)
             |                 / (CAST(t.tot AS DOUBLE) * rt.r_tot * ct.c_tot)) AS chi2
             |      FROM obs JOIN rt USING (seg) JOIN ct USING (st) CROSS JOIN t
             |      GROUP BY 1, 2, 3)
             |SELECT tot, r, c,
             |       CAST(round(chi2 * 1e6) AS BIGINT) AS chi2_e6,
             |       CAST(round(sqrt(chi2 / (tot * (least(r, c) - 1))) * 1e6) AS BIGINT)
             |         AS v_e6
             |FROM x""".stripMargin),
      (s, d) => {
        val obs = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_orderstatus").as("st"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        val rt = obs.groupBy("seg").agg(sum("cnt").cast("long").as("r_tot"))
        val ct = obs.groupBy("st").agg(sum("cnt").cast("long").as("c_tot"))
        val t = obs.agg(sum("cnt").cast("long").as("tot"),
          countDistinct("seg").cast("long").as("r"),
          countDistinct("st").cast("long").as("c"))
        obs.join(broadcast(rt), "seg").join(broadcast(ct), "st")
          .crossJoin(broadcast(t))
          .groupBy("tot", "r", "c")
          .agg(sum(expr(
            """CAST(CAST(cnt * tot - r_tot * c_tot AS DECIMAL(38,0))
              | * (cnt * tot - r_tot * c_tot) AS DOUBLE)
              | / (CAST(tot AS DOUBLE) * r_tot * c_tot)""".stripMargin))
            .as("chi2"))
          .select(col("tot"), col("r"), col("c"),
            expr("CAST(round(chi2 * 1e6) AS BIGINT)").as("chi2_e6"),
            expr("""CAST(round(sqrt(chi2 / (tot * (least(r, c) - 1))) * 1e6)
                   | AS BIGINT)""".stripMargin).as("v_e6"))
      }))
}
