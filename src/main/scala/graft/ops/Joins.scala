package graft.ops

import graft.Q
import graft.io.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.1 J1/J2 + §2.2 extensions).
  *
  * Scale notes baked into each plan:
  *  - FIXED-cardinality dimensions (region/nation, literal frames,
  *    1-row aggregates) may be `broadcast()`-hinted; corpus-SCALING
  *    sides (customer, supplier, per-user/doc projections) are left
  *    unhinted so stats/AQE broadcast them only while they fit —
  *    a pinned broadcast on a scaling side is an executor-OOM at
  *    100 TB (SCALE.md round-9 broadcast-hint policy);
  *  - semi/anti joins never materialize right-side payload columns;
  *  - the as-of join is ONE shuffle: union both inputs, hash-partition by
  *    key, sort within partition, window `last(ignoreNulls)` — the
  *    sort-merge formulation that survives 100 TB (a correlated
  *    subquery / per-row probe would not).
  */
object Joins {

  /** The union-as-of kernel shared by EVERY as-of variant (backward,
    * forward, nearest, tolerance, and Extras51's funnel): purchases
    * (probes) and views (candidates) unioned into one frame, ONE hash
    * shuffle on the user key, in-partition sort by (t, is_probe) —
    * candidates sort before probes at equal timestamps, which encodes
    * the "<=" semantics (">=" when descending) — then a running
    * last(ignoreNulls) carries the matched view timestamp onto each
    * probe row. `dirs` adds one output column per (name, descending)
    * pair; all windows share the partitionBy("k") exchange, so the
    * nearest join's two directions ride one shuffle (two in-partition
    * sorts). The tie-ordering convention lives HERE and nowhere else —
    * it used to be copy-pasted at five sites, where a fix to one copy
    * could silently miss the others (each site has its own oracle, so
    * a missed copy = a latent divergence, not a loud failure).
    *
    * Returns probe rows (event_id, k, t, dirs...); callers rename. */
  def asOfViews(ev: org.apache.spark.sql.DataFrame,
      dirs: Seq[(String, Boolean)]): org.apache.spark.sql.DataFrame = {
    val p = ev.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"), col("ts").as("t"), col("event_id"),
      lit(null).cast("timestamp").as("v_ts"), lit(1).as("is_probe"))
    val v = ev.filter(col("event_type") === "view").select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(null).cast("long").as("event_id"),
      col("ts").as("v_ts"), lit(0).as("is_probe"))
    val out = dirs.foldLeft(p.unionByName(v)) { case (df, (name, desc)) =>
      val ord = if (desc) col("t").desc else col("t").asc
      // unboundedPreceding→currentRow evaluates incrementally (O(n)
      // per partition); the mirrored descending sort keeps the forward
      // direction on the same frame shape (a following frame would be
      // re-evaluated per row — O(n²) on a hot key)
      val w = Window.partitionBy("k").orderBy(ord, col("is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(name, last("v_ts", ignoreNulls = true).over(w))
    }
    out.filter(col("is_probe") === 1)
      .select(col("event_id") +: col("k") +: col("t") +:
        dirs.map(d => col(d._1)): _*)
  }

  def queries: Seq[Q] = Seq(
    // J1 — FK equi-join, 1-N (reference models.py:17,32: jobs.user_id →
    // users.id). No broadcast hint on purpose: customer SCALES with the
    // corpus (unlike region/nation), so a pinned broadcast is an
    // executor-OOM at 100 TB — stats/AQE pick the broadcast join
    // whenever the dim actually fits (they do at every test SF; plan
    // spec pins it) and degrade to a shuffled join when it doesn't.
    // `join_hinted` is the explicit-hint demo; `join_cost_advisor`
    // makes this choice from measured fanout.
    Q("join_fk",
      Some("""SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, d) => {
        val o = orders(s, d)
        val c = customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(o("o_orderkey"), o("o_totalprice"), c("c_name"), c("c_mktsegment"))
          .orderBy("o_orderkey")
      }),

    // J2 — existence probe (reference app.py:83 duplicate-username
    // check) as a LEFT SEMI join: right side contributes no columns,
    // probe stops at first match.
    Q("semi_exists",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    // anti join — NOT EXISTS (customers with no orders).
    Q("join_anti",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val c = customer(s, d)
        val o = orders(s, d).select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }),

    // as-of join — for each purchase event, the user's latest view event
    // at or before it. Implemented as union + ONE hash shuffle on the
    // key + in-partition sort + running last(ignoreNulls): O(n log n)
    // per partition, no per-row probe, no skew amplification — the
    // sort-merge as-of formulation that survives 100 TB.
    Q("join_asof",
      Some("""SELECT p.event_id, p.user_id, p.ts,
             |       (SELECT max(v.ts) FROM events v
             |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |          AND v.ts <= p.ts) AS last_view_ts
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => asOfViews(events(s, d), Seq("last_view_ts" -> false))
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          col("last_view_ts"))
        .orderBy("event_id")),

    // forward as-of join — for each purchase, the user's EARLIEST view
    // at or after it. Same union + one-shuffle formulation as the
    // backward join, with the SORT mirrored (t desc) so the frame stays
    // unboundedPreceding→currentRow: Spark evaluates that frame
    // incrementally (O(n) per partition), whereas a
    // currentRow→unboundedFollowing frame is re-evaluated per row
    // (O(n²) — a hot key would straggle at scale).
    Q("join_asof_forward",
      Some("""SELECT p.event_id, p.user_id, p.ts,
             |       (SELECT min(v.ts) FROM events v
             |        WHERE v.user_id = p.user_id AND v.event_type = 'view'
             |          AND v.ts >= p.ts) AS next_view_ts
             |FROM events p WHERE p.event_type = 'purchase'
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => asOfViews(events(s, d), Seq("next_view_ts" -> true))
        .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
          col("next_view_ts"))
        .orderBy("event_id")),

    // nearest as-of join — for each purchase, the user's view event
    // CLOSEST in time, either direction (ties → the earlier one). Both
    // directional passes ride ONE hash shuffle on the key (two
    // in-partition sorts); the pick is a pure comparison on the two
    // candidates — still no per-row probe.
    Q("join_asof_nearest",
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'purchase'),
             |b AS (SELECT p.event_id, max(v.ts) AS bt FROM p
             |      LEFT JOIN events v ON v.user_id = p.user_id
             |       AND v.event_type = 'view' AND v.ts <= p.ts GROUP BY 1),
             |f AS (SELECT p.event_id, min(v.ts) AS ft FROM p
             |      LEFT JOIN events v ON v.user_id = p.user_id
             |       AND v.event_type = 'view' AND v.ts >= p.ts GROUP BY 1)
             |SELECT p.event_id, p.user_id, p.ts,
             |       CASE WHEN bt IS NULL THEN ft WHEN ft IS NULL THEN bt
             |            WHEN epoch_us(p.ts) - epoch_us(bt)
             |                 <= epoch_us(ft) - epoch_us(p.ts) THEN bt
             |            ELSE ft END AS nearest_view_ts
             |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
             |ORDER BY event_id""".stripMargin),
      (s, d) => {
        asOfViews(events(s, d), Seq("bt" -> false, "ft" -> true))
          .withColumn("nearest_view_ts",
            when(col("bt").isNull, col("ft"))
              .when(col("ft").isNull, col("bt"))
              .when(unix_micros(col("t")) - unix_micros(col("bt")) <=
                unix_micros(col("ft")) - unix_micros(col("t")), col("bt"))
              .otherwise(col("ft")))
          .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
            col("nearest_view_ts"))
          .orderBy("event_id")
      }),

    // range join — events of the same user within 1 hour after each
    // signup: equi-key join with a range residual (the equi key bounds
    // the pair space; NOT a cross join).
    Q("join_range",
      Some("""SELECT s.event_id, count(e.event_id) AS n_follow
             |FROM events s LEFT JOIN events e
             |  ON e.user_id = s.user_id
             | AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
             |WHERE s.event_type = 'signup'
             |GROUP BY s.event_id ORDER BY s.event_id""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val sgn = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
            col("ts").as("s_ts"))
        val fol = ev.select(col("event_id").as("e_id"),
          col("user_id").as("e_user"), col("ts").as("e_ts"))
        sgn.join(fol,
          fol("e_user") === sgn("s_user") &&
            fol("e_ts") > sgn("s_ts") &&
            fol("e_ts") <= sgn("s_ts") + expr("INTERVAL 1 HOUR"),
          "left")
          .groupBy(col("s_id").as("event_id"))
          .agg(count(col("e_id")).as("n_follow"))
          .orderBy("event_id")
      })
  )
}
