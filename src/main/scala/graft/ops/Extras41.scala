package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Round-4 wave-39 operators: blocked fuzzy (edit-distance) join and
  * Cramér's V association strength.
  */
object Extras41 {

  def queries: Seq[Q] = Seq(
    // fuzzy self-join, dedup-block-verify-expand: fuzzy joins on
    // low-cardinality text columns must NOT pay per-ROW — the name
    // space here is 64 distinct strings behind 20k parts (dup groups
    // of ~300), so candidate generation runs on DISTINCT names only:
    // deletion-neighborhood blocking (each name emits one drop-word-i
    // key per word, the PassJoin trick — any single-word edit collides
    // on the aligned key), thresholded-levenshtein verify (O(len·3)
    // early-exit), then the tiny verified name-pair table broadcasts
    // back over the part table to expand to part-level neighbors. The
    // same row-level blocking ran 50M candidate levenshteins; this
    // shape runs 4k — and at 100 TB the expand stays one broadcast
    // join. Per part: distinct-neighbor count within distance 3 and
    // the closest neighbor (lexicographic struct-min = argmin); no-
    // match parts keep -1 sentinels via the left join back.
    // RECALL BOUND (by design, identical in both engines): drop-one-
    // word keys only collide for pairs whose edits fall within a
    // single word of same-word-count names — a distance-<=3 pair whose
    // edits span two words (or that inserts/deletes a whole word)
    // generates no candidate and is not counted. Full distance-3
    // recall would need per-word deletion-neighborhood keys (~len x
    // more blocking rows); n_matches/closest_d are lower bounds
    // w.r.t. unrestricted levenshtein, and the oracle applies the
    // SAME blocking, so the contract is exact for what it claims.
    Q("join_fuzzy_blocked",
      Some("""WITH nm AS (SELECT DISTINCT p_name FROM part),
             |w AS (SELECT p_name, string_split(p_name, ' ') AS ws FROM nm),
             |keyed AS (SELECT p_name,
             |            array_to_string(list_concat(ws[1:i], ws[i+2:]), ' ')
             |              || '#' || CAST(i AS VARCHAR) AS bkey
             |          FROM w, LATERAL unnest(range(len(ws))) AS u(i)),
             |np AS (SELECT DISTINCT a.p_name AS na, b.p_name AS nb
             |       FROM keyed a JOIN keyed b ON a.bkey = b.bkey),
             |v AS (SELECT na, nb, CAST(levenshtein(na, nb) AS BIGINT) AS dd
             |      FROM np WHERE na <> nb AND levenshtein(na, nb) <= 3),
             |g1 AS (SELECT p_name, CAST(count(*) AS BIGINT) AS cnt,
             |              min(p_partkey) AS mk1
             |       FROM part GROUP BY 1),
             |g2 AS (SELECT p.p_name, min(p.p_partkey) AS mk2
             |       FROM part p JOIN g1 USING (p_name)
             |       WHERE p.p_partkey > g1.mk1 GROUP BY 1),
             |mo AS (SELECT v.na, CAST(sum(o.cnt) AS BIGINT) AS others,
             |              min(struct_pack(d := v.dd, k2 := o.mk1)) AS besto
             |       FROM v JOIN g1 o ON v.nb = o.p_name GROUP BY 1),
             |nmap AS (SELECT g1.p_name, g1.cnt, g1.mk1, g2.mk2,
             |                coalesce(mo.others, 0) AS others, mo.besto
             |         FROM g1 LEFT JOIN g2 USING (p_name)
             |                 LEFT JOIN mo ON g1.p_name = mo.na)
             |SELECT p.p_partkey,
             |       n.cnt - 1 + n.others AS n_matches,
             |       CAST(CASE WHEN n.cnt > 1 THEN 0
             |                 WHEN n.others > 0 THEN n.besto.d
             |                 ELSE -1 END AS BIGINT) AS closest_d,
             |       CAST(CASE WHEN n.cnt > 1 THEN
             |                   (CASE WHEN n.mk1 = p.p_partkey THEN n.mk2
             |                         ELSE n.mk1 END)
             |                 WHEN n.others > 0 THEN n.besto.k2
             |                 ELSE -1 END AS BIGINT) AS closest_key
             |FROM part p JOIN nmap n ON p.p_name = n.p_name
             |ORDER BY p.p_partkey""".stripMargin),
      (s, d) => {
        val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
        val keyed = parts.select(col("p_name")).distinct()
          .select(col("p_name"), split(col("p_name"), " ").as("ws"))
          .select(col("p_name"),
            explode(expr(
              """transform(sequence(0, size(ws) - 1), i ->
                | concat(array_join(concat(slice(ws, 1, i),
                |   slice(ws, i + 2, size(ws))), ' '), '#', CAST(i AS STRING)))"""
                .stripMargin)).as("bkey"))
        val verified = keyed.select(col("p_name").as("na"), col("bkey"))
          .join(keyed.select(col("p_name").as("nb"), col("bkey")), Seq("bkey"))
          .select("na", "nb").distinct()
          .filter(col("na") =!= col("nb"))
          .withColumn("dd", levenshtein(col("na"), col("nb"), 3).cast("long"))
          .filter(col("dd") >= 0)
        // name-level closed form: a part's neighbor count is (own dup
        // group − 1) + Σ matched-group sizes, and the argmin is either
        // the own group's min-key (min2 when p IS the min) at d=0, or
        // the best (d, min-key) over matched names — so the per-part
        // answer is a broadcast map over parts, never a pair expansion.
        val g1 = parts.groupBy("p_name")
          .agg(count(lit(1)).cast("long").as("cnt"),
            min("p_partkey").as("mk1"))
        val g2 = parts.join(g1, "p_name")
          .filter(col("p_partkey") > col("mk1"))
          .groupBy("p_name").agg(min("p_partkey").as("mk2"))
        val mo = verified
          // name-keyed frames are UNHINTED (r9 policy): distinct
          // p_name grows with the part table unless the data model
          // caps it — stats/AQE broadcast while the frame actually fits
          .join(g1.select(col("p_name").as("nb"),
            col("cnt").as("ocnt"), col("mk1").as("omk")), "nb")
          .groupBy(col("na"))
          .agg(sum("ocnt").cast("long").as("others"),
            min(struct(col("dd").as("d"), col("omk").as("k2"))).as("besto"))
        val nmap = g1.join(g2, Seq("p_name"), "left")
          .join(mo, g1("p_name") === mo("na"), "left")
          .select(col("p_name"), col("cnt"), col("mk1"), col("mk2"),
            coalesce(col("others"), lit(0L)).as("others"), col("besto"))
        parts.join(nmap, "p_name")
          .select(col("p_partkey"),
            (col("cnt") - 1 + col("others")).as("n_matches"),
            when(col("cnt") > 1, 0L)
              .when(col("others") > 0, col("besto.d"))
              .otherwise(-1L).cast("long").as("closest_d"),
            when(col("cnt") > 1,
              when(col("mk1") === col("p_partkey"), col("mk2"))
                .otherwise(col("mk1")))
              .when(col("others") > 0, col("besto.k2"))
              .otherwise(-1L).cast("long").as("closest_key"))
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
             |             sum(CAST((CAST(obs.cnt AS HUGEINT) * t.tot - CAST(rt.r_tot AS HUGEINT) * ct.c_tot)
             |                      * (CAST(obs.cnt AS HUGEINT) * t.tot - CAST(rt.r_tot AS HUGEINT) * ct.c_tot) AS DOUBLE)
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
          // operands widen BEFORE the multiply: cnt·tot ~ tot²/15
          // crosses 2⁶³ near 1.2e10 orders — casting the already-
          // overflowed 64-bit product was the class-1 width cliff
          .agg(sum(expr(
            """CAST((CAST(cnt AS DECIMAL(38,0)) * tot - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
              | * (CAST(cnt AS DECIMAL(38,0)) * tot - CAST(r_tot AS DECIMAL(38,0)) * c_tot) AS DOUBLE)
              | / (CAST(tot AS DOUBLE) * r_tot * c_tot)""".stripMargin))
            .as("chi2"))
          .select(col("tot"), col("r"), col("c"),
            expr("CAST(round(chi2 * 1e6) AS BIGINT)").as("chi2_e6"),
            expr("""CAST(round(sqrt(chi2 / (tot * (least(r, c) - 1))) * 1e6)
                   | AS BIGINT)""".stripMargin).as("v_e6"))
      }))
}
