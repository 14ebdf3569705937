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
