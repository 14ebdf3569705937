package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-39 operators. */
class Extras41Spec extends SparkSpec {

  test("fuzzy join: one row per part; sentinels consistent; symmetry of matching") {
    import spark.implicits._
    val got = SparkEntry.queries("join_fuzzy_blocked")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val nParts = graft.io.Tables.part(spark, sf0001).count()
    assert(got.length == nParts, "one row per part")
    got.foreach { case (k, n, d, k2) =>
      if (n == 0) assert(d == -1 && k2 == -1, s"part $k sentinel")
      else {
        assert(d >= 0 && d <= 3, s"part $k distance in threshold")
        assert(k2 != k && k2 >= 0, s"part $k neighbor is another part")
      }
    }
    // matching is symmetric: if a matched b (as closest), b matched someone
    val matched = got.filter(_._2 > 0).map(_._1).toSet
    got.filter(_._2 > 0).foreach { case (k, _, _, k2) =>
      assert(matched.contains(k2), s"closest neighbor $k2 of $k also has a match")
    }
    assert(got.exists(_._2 > 0), "corpus has near-duplicate part names")
  }

  test("Cramér's V: in [0,1]; χ² consistent with stat_chi_square's cell terms") {
    import spark.implicits._
    val Array((tot, r, c, chi2E6, vE6)) =
      SparkEntry.queries("stat_cramers_v")(spark, sf0001)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(r == 5 && c == 3)
    assert(vE6 >= 0 && vE6 <= 1000000L)
    val cells = SparkEntry.queries("stat_chi_square")(spark, sf0001)
      .select(col("term_e6")).as[Long].collect()
    assert(math.abs(chi2E6 - cells.sum) <= cells.length,
      "χ² = Σ per-cell terms (within per-cell rounding)")
    val v = math.sqrt(chi2E6 / 1e6 / (tot * (math.min(r, c) - 1)))
    assert(math.abs(vE6 - v * 1e6) <= 2)
  }
}
