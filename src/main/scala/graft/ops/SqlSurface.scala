package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's SQL surface: `spark.sql` over temp views of the
  * testdata tables — the same Catalyst plans as the DataFrame API, via
  * ANSI SQL. Covers the subquery + grouping-sets categories the
  * DataFrame queries don't exercise.
  */
object SqlSurface {

  /** Register sf-dir tables as temp views (idempotent). */
  def registerViews(s: SparkSession, d: String, names: String*): Unit =
    names.foreach { n =>
      val df = if (n == "events") Tables.events(s, d) else Tables.table(s, d, n)
      df.createOrReplaceTempView(n)
    }

  private def sql(views: Seq[String], q: String): (SparkSession, String) => DataFrame =
    (s, d) => { registerViews(s, d, views: _*); s.sql(q) }

  /** Oracle text == engine text: ONE SQL string registered for both —
    * DuckDB gets it as the oracle, Spark parses the same bytes. The
    * nine queries below had byte-identical copies in both positions;
    * a single-copy helper removes ~130 duplicated lines and the
    * maintain-two-copies drift hazard (an edit to one copy read as a
    * cross-engine failure instead of a compile-visible change). */
  private def sameSql(name: String, views: Seq[String], q: String): Q =
    Q(name, Some(q), sql(views, q))

  def queries: Seq[Q] = Seq(
    // TPC-H Q6-shaped filtered aggregate through the SQL parser;
    // predicate reaches the parquet scan as PushedFilters.
    sameSql("sql_filtered_agg", Seq("lineitem"),
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
             |            AS DOUBLE) AS revenue,
             |       count(*) AS n
             |FROM lineitem
             |WHERE l_discount >= 0.05 AND l_quantity < 24""".stripMargin),

    // named WINDOW clause: one window definition shared by several
    // functions — parsed once, planned as ONE Window operator (one
    // shuffle+sort on the partition key, not three).
    sameSql("sql_named_window", Seq("orders"),
      """SELECT o_custkey, o_orderkey,
             |       CAST(row_number() OVER w AS BIGINT) AS rn,
             |       CAST(rank() OVER w AS BIGINT) AS rk,
             |       lag(o_totalprice) OVER w AS prev_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // Spark 4 collations: case-insensitive compare + sort via the
    // UTF8_LCASE collation (a property of the comparison, pushed into
    // codegen) — the oracle spells the same semantics with lower().
    Q("str_collation",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE lower(c_mktsegment) = 'building'
             |ORDER BY lower(c_name), c_custkey""".stripMargin),
      sql(Seq("customer"),
        """SELECT c_custkey, c_name FROM customer
          |WHERE collate(c_mktsegment, 'UTF8_LCASE') = 'building'
          |ORDER BY collate(c_name, 'UTF8_LCASE'), c_custkey""".stripMargin)),

    // SQL PIVOT clause (the relational spelling of pivot_counts); the
    // oracle states the semantics with FILTER aggregates. coalesce
    // pins empty cells to 0 on both sides.
    Q("sql_pivot",
      Some("""SELECT o_orderpriority,
             |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             |       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin),
      sql(Seq("orders"),
        """SELECT o_orderpriority,
          |       CAST(coalesce(n_f, 0) AS BIGINT) AS n_f,
          |       CAST(coalesce(n_o, 0) AS BIGINT) AS n_o,
          |       CAST(coalesce(n_p, 0) AS BIGINT) AS n_p
          |FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
          |  PIVOT (count(*) FOR o_orderstatus IN ('F' AS n_f, 'O' AS n_o, 'P' AS n_p))
          |ORDER BY o_orderpriority""".stripMargin)),

    // SQL UNPIVOT clause: wide metrics → (key, metric, value) rows;
    // mixed int/double inputs coerce to the least common type.
    Q("sql_unpivot",
      Some("""SELECT c_custkey, 'bal' AS metric, c_acctbal AS val FROM customer
             |UNION ALL
             |SELECT c_custkey, 'nation', CAST(c_nationkey AS DOUBLE) FROM customer
             |ORDER BY c_custkey, metric""".stripMargin),
      // INCLUDE NULLS spelled out: the oracle's UNION ALL keeps NULL
      // values, and Spark's UNPIVOT default (EXCLUDE NULLS) would
      // silently drop those rows the first time the column is nullable
      sql(Seq("customer"),
        """SELECT c_custkey, metric, val FROM customer
          |UNPIVOT INCLUDE NULLS (val FOR metric IN (c_acctbal AS bal, c_nationkey AS nation))
          |ORDER BY c_custkey, metric""".stripMargin)),

    // correlated LATERAL subquery with per-row LIMIT — top-2 orders per
    // customer written as the dependent join it is; Catalyst decorrelates
    // to a ranked window, not a per-row re-execution. DuckDB runs the
    // identical SQL.
    sameSql("sql_lateral_topn", Seq("customer", "orders"),
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c, LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
             |ORDER BY c_custkey, o_orderkey""".stripMargin),

    // correlated EXISTS subquery → planned as a semi join.
    sameSql("sql_exists_subquery", Seq("customer", "orders"),
      """SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin),

    // explode_outer: generator that PRESERVES rows whose array is
    // empty (as a NULL element) — the left-join flavor of explode;
    // plain explode would silently drop short docs from the output.
    // DuckDB spells the same semantics by substituting [NULL] for the
    // empty list before unnesting.
    Q("sql_explode_outer",
      Some("""SELECT doc_id, long_tok FROM (
             |  SELECT doc_id,
             |         unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS long_tok
             |  FROM (SELECT doc_id,
             |          list_filter(string_split_regex(lower(trim(text)), ' +'),
             |                      t -> length(t) > 8) AS l
             |        FROM documents) a) b
             |ORDER BY doc_id, long_tok""".stripMargin),
      (s, d) => {
        registerViews(s, d, "documents")
        s.sql("""SELECT doc_id, long_tok FROM (
                |  SELECT doc_id,
                |         explode_outer(filter(split(lower(trim(text)), ' +'),
                |                              t -> length(t) > 8)) AS long_tok
                |  FROM documents) b
                |ORDER BY doc_id, long_tok""".stripMargin)
      }),

    // DISTRIBUTE BY / SORT BY: the SQL spelling of repartition +
    // sortWithinPartitions (partition-local order without a global
    // sort) — the layout primitive behind clustered writes. The outer
    // ORDER BY pins the result for the oracle.
    Q("sql_distribute_by",
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
             |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin),
      sql(Seq("lineitem"),
        """SELECT l_orderkey, l_linenumber, l_returnflag FROM (
          |  SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
          |  DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_orderkey) t
          |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // discrete percentiles (WITHIN GROUP ordered-set aggregate):
    // percentile_disc returns an ACTUAL data value (first element at
    // cumulative probability ≥ p), so doubles copy verbatim — exact
    // across engines with no interpolation arithmetic at all.
    Q("agg_percentile_disc",
      Some("""SELECT l_returnflag,
             |       quantile_disc(l_quantity, 0.25) AS q25,
             |       quantile_disc(l_quantity, 0.5)  AS q50,
             |       quantile_disc(l_quantity, 0.9)  AS q90
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      sql(Seq("lineitem"),
        """SELECT l_returnflag,
          |       percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25,
          |       percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS q50,
          |       percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS q90
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // keyset-free pagination: ORDER BY + LIMIT/OFFSET (Spark 3.4+
    // supports OFFSET). Page 3 of the price-ranked orders; the plan
    // still prunes with a global top-(limit+offset), not a full sort.
    sameSql("sql_pagination", Seq("orders"),
      """SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 20 OFFSET 40""".stripMargin),

    // SQL view definition + consumption: the reusable-query surface
    // (a temp view of an aggregate consumed by a join) — Catalyst
    // inlines the view, so no materialization boundary appears.
    Q("sql_create_view",
      Some("""WITH big_custs AS (SELECT o_custkey, count(*) AS n_orders
             |                  FROM orders GROUP BY 1 HAVING count(*) >= 10)
             |SELECT c.c_custkey, c.c_name, b.n_orders
             |FROM big_custs b JOIN customer c ON c.c_custkey = b.o_custkey
             |ORDER BY c.c_custkey""".stripMargin),
      (s, d) => {
        registerViews(s, d, "orders", "customer")
        s.sql("""CREATE OR REPLACE TEMPORARY VIEW graft_big_custs AS
                |SELECT o_custkey, count(*) AS n_orders
                |FROM orders GROUP BY 1 HAVING count(*) >= 10""".stripMargin)
        s.sql("""SELECT c.c_custkey, c.c_name, b.n_orders
                |FROM graft_big_custs b JOIN customer c ON c.c_custkey = b.o_custkey
                |ORDER BY c.c_custkey""".stripMargin)
      }),

    // GROUP BY ALL / ORDER BY ALL (Spark 4 + DuckDB share the modern
    // shorthand): every non-aggregate select item groups, every output
    // column orders — the hand-written list can't drift from the
    // projection.
    sameSql("sql_group_by_all", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
             |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin),

    // parameterized SQL: named parameter markers bound server-side
    // (spark.sql(text, args)) — the injection-safe form of the
    // reference's f-string query building (app.py's string-built
    // routes); the oracle inlines the same constants.
    Q("sql_parameterized",
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        registerViews(s, d, "customer")
        s.sql(
          """SELECT c_custkey, c_name, c_acctbal FROM customer
            |WHERE c_mktsegment = :seg AND c_acctbal > :minbal
            |ORDER BY c_custkey""".stripMargin,
          Map("seg" -> "BUILDING", "minbal" -> 5000.0))
      }),

    // NOT IN vs NOT EXISTS under three-valued logic: one NULL in the
    // NOT IN subquery's output makes every membership test UNKNOWN →
    // zero rows (Spark plans the null-aware anti join to honor this);
    // NOT EXISTS is null-safe and returns the real complement. Both
    // branches in one query so the contrast is pinned by the oracle.
    sameSql("sql_not_in_nulls", Seq("customer", "orders"),
      """WITH dim AS (SELECT CASE WHEN c_nationkey = 5 THEN c_custkey END AS k
             |            FROM customer)
             |SELECT 'not_in' AS variant, count(*) AS n FROM orders
             |WHERE o_custkey NOT IN (SELECT k FROM dim)
             |UNION ALL
             |SELECT 'not_exists', count(*) FROM orders o
             |WHERE NOT EXISTS (SELECT 1 FROM dim WHERE dim.k = o.o_custkey)
             |ORDER BY variant""".stripMargin),

    // scalar subquery (uncorrelated) + IN subquery.
    sameSql("sql_scalar_in_subquery", Seq("customer", "orders"),
      """SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
             |  AND o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'BUILDING')
             |ORDER BY o_orderkey""".stripMargin),

    // explicit GROUPING SETS (beyond cube/rollup).
    Q("sql_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      sql(Seq("lineitem"),
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // positional generator through SQL: LATERAL VIEW posexplode keeps
    // the element index — the token-position shape (attention masks,
    // span labeling) that plain explode loses.
    Q("sql_posexplode",
      Some("""SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
             |       unnest(toks) AS word
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t
             |ORDER BY doc_id, pos""".stripMargin),
      sql(Seq("documents"),
        """SELECT doc_id, pos, word FROM documents
          |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, word
          |ORDER BY doc_id, pos""".stripMargin)),

    // NATURAL JOIN: the implicit equi-join on all shared column names —
    // views expose the FK under one name, and the joined schema keeps a
    // single copy of it (the USING/NATURAL projection rule).
    Q("sql_natural_join",
      Some("""WITH n AS (SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation),
             |r AS (SELECT r_regionkey AS regionkey, r_name FROM region)
             |SELECT n_nationkey, n_name, regionkey, r_name
             |FROM n NATURAL JOIN r ORDER BY n_nationkey""".stripMargin),
      (s, d) => {
        Tables.nation(s, d)
          .selectExpr("n_nationkey", "n_name", "n_regionkey AS regionkey")
          .createOrReplaceTempView("nation_nj")
        Tables.region(s, d)
          .selectExpr("r_regionkey AS regionkey", "r_name")
          .createOrReplaceTempView("region_nj")
        s.sql("""SELECT n_nationkey, n_name, regionkey, r_name
                |FROM nation_nj NATURAL JOIN region_nj
                |ORDER BY n_nationkey""".stripMargin)
      }),

    // multi-way star join through SQL (region→nation→customer→orders).
    sameSql("sql_star_join", Seq("region", "nation", "customer", "orders"),
      """SELECT r.r_name, n.n_name, count(o.o_orderkey) AS n_orders
             |FROM region r
             |JOIN nation n ON n.n_regionkey = r.r_regionkey
             |JOIN customer c ON c.c_nationkey = n.n_nationkey
             |JOIN orders o ON o.o_custkey = c.c_custkey
             |GROUP BY r.r_name, n.n_name
             |ORDER BY r.r_name, n.n_name""".stripMargin)
  )
}
