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
      })
  )
}
