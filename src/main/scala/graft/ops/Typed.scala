package graft.ops

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset surface (SURVEY.md §1.1: `Dataset[T]` where compile-time
  * field checks help) + the UDAF extension point as a typed
  * `Aggregator[IN, BUF, OUT]` — partial (reduce) + merge phases map onto
  * Spark's partial/final aggregation, so the custom aggregate shuffles
  * only its buffer, exactly like a built-in.
  */
object Typed {

  final case class LineRow(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

  /** Mean quantity as a typed Aggregator. l_quantity is integral-valued,
    * so the double partial sums are exact in any order (oracle-safe). */
  object MeanQty extends Aggregator[LineRow, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: LineRow): (Double, Long) =
      (b._1 + a.l_quantity, b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Seq[Q] = Seq(
    // typed groupByKey + custom Aggregator (UDAF surface).
    Q("typed_agg",
      Some("""SELECT l_returnflag, SUM(l_quantity) / count(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .as[LineRow]
          .groupByKey(_.l_returnflag)
          .agg(MeanQty.toColumn.name("avg_qty"))
          .toDF("l_returnflag", "avg_qty")
          .orderBy("l_returnflag")
      }),

    // typed filter+map pipeline (Dataset transforms with case classes).
    Q("typed_map_filter",
      Some("""SELECT l_orderkey, l_quantity * 2 AS double_qty FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity >= 30
             |ORDER BY l_orderkey, double_qty""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .as[LineRow]
          .filter(r => r.l_returnflag == "R" && r.l_quantity >= 30)
          .map(r => (r.l_orderkey, r.l_quantity * 2))
          .toDF("l_orderkey", "double_qty")
          .orderBy("l_orderkey", "double_qty")
      }),

    // typed cogroup: both sides grouped by the same key, one function
    // sees each key's two iterators (the general two-input per-key op;
    // Dataset.mapGroups: exactly one output row per key from an
    // arbitrary function over the group iterator — the typed surface
    // between reduceGroups (pairwise) and flatMapGroups (0..n). The
    // function streams the iterator (no materialization), computing
    // the quantity span + count in one pass.
    Q("typed_map_groups",
      Some("""SELECT l_returnflag,
             |       max(l_quantity) - min(l_quantity) AS qty_span,
             |       CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .as[LineRow]
          .groupByKey(_.l_returnflag)
          .mapGroups { (k, rows) =>
            var mn = Double.MaxValue; var mx = Double.MinValue; var n = 0L
            rows.foreach { r =>
              if (r.l_quantity < mn) mn = r.l_quantity
              if (r.l_quantity > mx) mx = r.l_quantity
              n += 1
            }
            (k, mx - mn, n)
          }
          .toDF("l_returnflag", "qty_span", "n")
          .orderBy("l_returnflag")
      }),

    // plans as CoGroup over co-partitioned shuffles — one exchange per
    // side, no join blow-up).
    Q("typed_cogroup",
      Some("""SELECT coalesce(o.k, l.k) AS o_key,
             |       coalesce(o.n, 0) AS n_orders,
             |       coalesce(l.n, 0) AS n_lines
             |FROM (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1) o
             |FULL OUTER JOIN
             |     (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1) l
             |  ON o.k = l.k
             |ORDER BY o_key""".stripMargin),
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select(col("o_orderkey")).as[Long]
          .groupByKey(identity)
        val l = Tables.lineitem(s, d).select(col("l_orderkey")).as[Long]
          .groupByKey(identity)
        o.cogroup(l) { (k, os, ls) =>
          Iterator((k, os.size.toLong, ls.size.toLong))
        }.toDF("o_key", "n_orders", "n_lines")
          .orderBy("o_key")
      }),

    // Dataset.joinWith: the typed join — both sides keep their object
    // identity (a pair per match, no column flattening/name clashes),
    // then a typed map projects the pair. Same BroadcastHashJoin
    // underneath as the untyped join.
    Q("typed_joinwith",
      Some("""SELECT o_orderkey, c_name FROM orders o JOIN customer c
             |ON o.o_custkey = c.c_custkey ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey")).as[(Long, Long)]
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name")).as[(Long, String)]
        o.joinWith(c, o("o_custkey") === c("c_custkey"))
          .map { case ((orderKey, _), (_, name)) => (orderKey, name) }
          .toDF("o_orderkey", "c_name")
          .orderBy("o_orderkey")
      }),

    // Dataset.reduceGroups: per-key pairwise reduction with a TOTAL
    // comparator (quantity desc, then orderkey asc), so the chosen
    // representative is independent of partitioning and reduce order —
    // the associativity requirement reduceGroups imposes, made
    // explicit. Oracle: argmax with min-key tie-break.
    Q("typed_reduce_groups",
      Some("""WITH m AS (SELECT l_returnflag, max(l_quantity) AS mq
             |           FROM lineitem GROUP BY 1)
             |SELECT m.l_returnflag, CAST(min(l.l_orderkey) AS BIGINT) AS l_orderkey,
             |       m.mq AS l_quantity
             |FROM m JOIN lineitem l
             |  ON l.l_returnflag = m.l_returnflag AND l.l_quantity = m.mq
             |GROUP BY 1, 3 ORDER BY 1""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .as[LineRow]
          .groupByKey(_.l_returnflag)
          .reduceGroups((a: LineRow, b: LineRow) =>
            if (a.l_quantity > b.l_quantity ||
              (a.l_quantity == b.l_quantity && a.l_orderkey < b.l_orderkey)) a
            else b)
          .map { case (k, r) => (k, r.l_orderkey, r.l_quantity) }
          .toDF("l_returnflag", "l_orderkey", "l_quantity")
          .orderBy("l_returnflag")
      }),

    // same-registered UDAF through the untyped/SQL surface.
    Q("typed_udaf_sql",
      Some("""SELECT l_returnflag, SUM(l_quantity) / count(*) AS avg_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        import s.implicits._
        s.udf.register("mean_qty", udaf(MeanQtyUntyped))
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_t")
        s.sql("""SELECT l_returnflag, mean_qty(l_quantity) AS avg_qty
                 FROM lineitem_t GROUP BY l_returnflag ORDER BY l_returnflag""")
      })
  )

  /** Column-input variant of the same aggregator for the SQL surface. */
  object MeanQtyUntyped extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + a, b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double = r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
