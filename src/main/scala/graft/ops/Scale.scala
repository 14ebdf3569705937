package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-mechanics operators: partitioned layout + partition pruning,
  * and skew-mitigating salted joins. On 100 TB these are the difference
  * between scanning a partition and scanning the lake, and between a
  * straggler task and an even shuffle.
  */
object Scale {

  /** Skew-safe equi-join: replicate the (small) right side `buckets`
    * times and spread each hot left key across `buckets` sub-keys, so
    * one hot key becomes `buckets` parallel tasks instead of one
    * straggler. `saltSource` must be a deterministic left-side column
    * (NOT rand(): speculative re-execution must re-salt identically).
    * Result is exactly the plain join's output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltSource: Column, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  def queries: Seq[Q] = Seq(
    // partitioned parquet layout + partition-pruned scan: write orders
    // partitioned by status, read back ONLY the 'F' partition (the scan
    // lists one directory; PartitionFilters, no data-file skip logic
    // needed). The oracle is the equivalent WHERE over the raw table.
    Q("sink_partitioned",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val path = s"${sys.props("java.io.tmpdir")}/graft_part_${d.replaceAll("[^A-Za-z0-9]", "_")}/orders_by_status"
        Tables.orders(s, d)
          .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        s.read.parquet(path)
          .filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      }),

    // big×big sort-merge join (broadcast suppressed via merge hint) —
    // the strategy Catalyst picks when neither side fits in memory.
    Q("join_sortmerge",
      Some("""SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate
             |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin),
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d).hint("merge")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(l("l_orderkey"), l("l_linenumber"), o("o_orderdate"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    // bucketed tables: both sides pre-hashed into the same bucket count
    // on the join key → the join runs with NO shuffle exchange (the
    // 100 TB answer to repeated joins on the same key).
    Q("join_bucketed",
      Some("""SELECT o.o_orderkey, o.o_totalprice, c.c_name
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_bucketed_${d.replaceAll("[^A-Za-z0-9]", "_")}"
        s.sql("DROP TABLE IF EXISTS graft_orders_b")
        s.sql("DROP TABLE IF EXISTS graft_customer_b")
        Tables.orders(s, d).write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/orders_b").saveAsTable("graft_orders_b")
        Tables.customer(s, d).write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/customer_b").saveAsTable("graft_customer_b")
        val o = s.table("graft_orders_b").hint("merge")
        val c = s.table("graft_customer_b").hint("merge")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(o("o_orderkey"), o("o_totalprice"), c("c_name"))
          .orderBy("o_orderkey")
      }),

    // salted join must be result-identical to the plain join → its
    // oracle IS the plain join SQL.
    Q("join_skew_salted",
      Some("""SELECT o.o_orderkey, c.c_name FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY o.o_orderkey""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        saltedJoin(o, c, "o_custkey", "c_custkey",
          saltSource = col("o_orderkey"), buckets = 8)
          .select(col("o_orderkey"), col("c_name"))
          .orderBy("o_orderkey")
      }),

    // dynamic partition pruning: fact laid out partitioned by the join
    // key, dimension filtered at runtime — Catalyst injects the dim's
    // surviving keys as a partition filter on the fact scan
    // (dynamicpruningexpression), so only 5 of 25 nation partitions are
    // read. At 100 TB this is the difference between scanning the lake
    // and scanning the region's slice; no hand-written pruning needed.
    Q("join_dpp",
      Some("""SELECT c.c_custkey, c.c_name, n.n_name
             |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
             |WHERE n.n_regionkey = 1
             |ORDER BY c.c_custkey""".stripMargin),
      (s, d) => {
        val path = s"${sys.props("java.io.tmpdir")}/graft_dpp_${d.replaceAll("[^A-Za-z0-9]", "_")}/customer_by_nation"
        Tables.customer(s, d)
          .write.mode("overwrite").partitionBy("c_nationkey").parquet(path)
        val c = s.read.parquet(path)
        val n = Tables.nation(s, d).filter(col("n_regionkey") === 1)
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .select(c("c_custkey"), c("c_name"), n("n_name"))
          .orderBy("c_custkey")
      }),

    // runtime bloom-filter pushdown: the selective predicate lives on
    // the small side (part), the big side (lineitem) has no static
    // filter — InjectRuntimeFilter builds a bloom filter from the
    // filtered dim keys and probes it on the fact BEFORE the shuffle,
    // cutting shuffled bytes by the dim's selectivity. Thresholds are
    // sized for the lake (10 GB scans); lowered here so the optimization
    // fires at test scale. Session-scoped confs on a forked session —
    // the shared session's conf is never touched (bench runs queries
    // concurrently).
    Q("join_bloom_filtered",
      Some("""SELECT l.l_orderkey, l.l_linenumber, p.p_name
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE p.p_size = 1
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin),
      (s, d) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        val l = Tables.lineitem(s2, d)
        val p = Tables.part(s2, d).filter(col("p_size") === 1)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .select(l("l_orderkey"), l("l_linenumber"), p("p_name"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    // Z-order-style clustering: interleave the bits of two filter
    // dimensions into one sort key, sort the layout by it, and rows
    // close in EITHER dimension land in the same files — min/max
    // footer stats then prune scans on both columns, which a
    // single-column sort only gives one of. The z-value is plain
    // integer arithmetic (bit i of a → 4^i, bit i of b → 2·4^i), so
    // the oracle recomputes it exactly; the clustered write is
    // repartitionByRange + sortWithinPartitions (total layout order,
    // no global sort at read time).
    Q("sink_zorder",
      Some {
        val terms = (0 until 5).flatMap { i =>
          Seq(s"((c_nationkey >> $i) & 1) * ${1L << (2 * i)}",
            s"(((c_custkey % 32) >> $i) & 1) * ${2L << (2 * i)}")
        }.mkString(" + ")
        s"""SELECT c_custkey, c_nationkey, CAST($terms AS BIGINT) AS zval
           |FROM customer ORDER BY c_custkey""".stripMargin
      },
      (s, d) => {
        val terms = (0 until 5).flatMap { i =>
          Seq(s"(shiftright(c_nationkey, $i) & 1) * ${1L << (2 * i)}L",
            s"(shiftright(c_custkey % 32, $i) & 1) * ${2L << (2 * i)}L")
        }.mkString(" + ")
        val path = s"${sys.props("java.io.tmpdir")}/graft_zorder_${d.replaceAll("[^A-Za-z0-9]", "_")}/customer_z"
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), expr(terms).as("zval"))
          .repartitionByRange(4, col("zval"))
          .sortWithinPartitions("zval")
          .write.mode("overwrite").parquet(path)
        s.read.parquet(path)
          .select("c_custkey", "c_nationkey", "zval")
          .orderBy("c_custkey")
      }),

    // salted two-phase exact COUNT(DISTINCT): the salt is derived from
    // the DISTINCT column itself (hash mod 64), so each distinct value
    // lands in exactly one (group, salt) cell — phase 1 counts
    // distincts per cell in parallel, phase 2 sums the cell counts.
    // A 3-group COUNT DISTINCT over 100 TB would otherwise funnel every
    // distinct key of a group through one task; this keeps 64-way
    // parallelism per group and stays exact (oracle = the plain
    // COUNT(DISTINCT)).
    Q("agg_distinct_salted",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"),
            pmod(xxhash64(col("l_partkey")), lit(64)).as("__salt"))
          .agg(count_distinct(col("l_partkey")).as("c"))
        cells.groupBy("l_returnflag")
          .agg(sum(col("c")).as("n_parts"))
          .orderBy("l_returnflag")
      })
  )
}
