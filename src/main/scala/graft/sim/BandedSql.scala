package graft.sim

/** The ONE spelling of each DuckDB CTE fragment the banded sign-LSH
  * oracles share (SCALE.md lessons: duplicated correctness-critical
  * spellings drift — one shared builder per contract). Every fragment
  * is text the width-parameterized renderers compose
  * ([[SimQueries.bandedOracles]], [[EmbIndexQueries]]); the engine
  * counterparts are [[Similarity.signBandKeys]] (band construction),
  * the 1e-6 quantization, and [[Similarity.exactCosAtLeast]] (the
  * 128-bit-integer threshold verify). Fragments assume a bound
  * `e(vec_id, emb)` CTE upstream.
  */
private[graft] object BandedSql {

  /** 1e-6-grid integer quantization of `e.emb` → `q(vec_id, qe)`. */
  val quantizeCte: String =
    """q AS (SELECT vec_id,
      |        list_transform(emb, x -> CAST(round(x * 1e6) AS BIGINT)) AS qe
      |      FROM e)""".stripMargin

  /** The two sign-band keys at `bits` dims each over `e` →
    * `k(vec_id, band, mask)` — the [[Similarity.signBandKeys]]
    * construction spelled relationally. */
  def bandKeysCte(bits: Int): String =
    s"""k AS (SELECT e.vec_id, b AS band,
       |        list_sum(list_transform(range($bits),
       |          i -> CASE WHEN emb[b*$bits+i+1] > 0 THEN 1<<i ELSE 0 END)) AS mask
       |      FROM e, LATERAL unnest([0, 1]) AS u(b))""".stripMargin

  /** The hot-bucket guard over `k` → surviving keys `k2` (per-bucket
    * occupancy ≤ 100, the registered queries' one guard value). */
  val guardCtes: String =
    """ok AS (SELECT band, mask FROM k GROUP BY band, mask
      |       HAVING count(*) <= 100),
      |k2 AS (SELECT k.* FROM k JOIN ok USING (band, mask))""".stripMargin

  /** Exact integer pair statistics over a pair CTE `src(aCol, bCol)`
    * against `q` → `out(aCol, bCol, dot, na, nb)`. */
  def pairStatsCte(out: String, src: String, aCol: String,
      bCol: String): String =
    s"""$out AS (SELECT $aCol, $bCol,
       |        list_sum(list_transform(range(len(qa.qe)),
       |          i -> qa.qe[i+1] * qb.qe[i+1])) AS dot,
       |        list_sum(list_transform(qa.qe, x -> x * x)) AS na,
       |        list_sum(list_transform(qb.qe, x -> x * x)) AS nb
       |      FROM $src JOIN q qa ON qa.vec_id = $src.$aCol
       |             JOIN q qb ON qb.vec_id = $src.$bCol)""".stripMargin

  /** The 128-bit-integer cos ≥ 1/5 verify predicate over (dot, na, nb)
    * — [[Similarity.exactCosAtLeast]](1, 5) spelled in HUGEINT. */
  val verifyQuarterPredicate: String =
    """na > 0 AND nb > 0 AND dot >= 0
      |          AND CAST(dot AS HUGEINT) * dot * 25 >=
      |              CAST(na AS HUGEINT) * nb""".stripMargin
}
