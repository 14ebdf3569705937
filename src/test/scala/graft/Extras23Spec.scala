package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-4 wave-21 operators: completeness bounds,
  * entropy bounds vs uniform maximum.
  */
class Extras23Spec extends SparkSpec {

  test("completeness: present <= expected; ratio recomputes; bounds (0, 1e6]") {
    import spark.implicits._
    val got = SparkEntry.queries("dq_completeness")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (u, p, e, c6) =>
      assert(p >= 1 && p <= e, s"user $u slot bounds")
      assert(c6 == math.round(p.toDouble * 1e6 / e), s"user $u recompute")
      assert(c6 > 0 && c6 <= 1000000L)
    }
  }

  test("token entropy: 0 <= H <= ln(n_types) (uniform maximum)") {
    import spark.implicits._
    val got = SparkEntry.queries("text_token_entropy")(spark, sf0001)
      .as[(Long, Long, Long)].collect()
    val types = SparkEntry.queries("text_lexical_diversity")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, dl, h6) =>
      assert(h6 >= 0, s"doc $id sign")
      // per-term µ-rounding can add at most ±0.5 per term
      val bound = math.round(math.log(types(id).toDouble) * 1e6) + types(id)
      assert(h6 <= bound, s"doc $id uniform bound")
    }
  }
}
