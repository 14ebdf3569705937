package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.Streams

/** Measurement main (not a driver contract): replays the events table
  * through the two stream-stream OUTER joins as `chunks` time-ordered
  * micro-batches and prints each batch's state-store row counts from
  * `StreamingQueryProgress`. The claim under test is the watermark
  * eviction contract the joins' scaladocs make — state is O(rows
  * inside the watermark + join horizon), NOT O(stream length) — which
  * a single-batch AvailableNow replay (the registered queries' shape)
  * can never show. Evidence lands in SERIAL.md.
  *
  * Usage: runMain graft.StreamStateProbe <sfDir> [chunks]
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.nonEmpty, "usage: StreamStateProbe <sfDir> [chunks]")
    val dir = args(0)
    val chunks = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("left_outer", "full_outer").foreach { jt =>
      val t0 = System.nanoTime()
      val rows = Streams.outerJoinStateProgress(spark, dir, jt, chunks)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $jt  dir=$dir chunks=$chunks wall=$secs%.1fs ==")
      println("batch | input_rows | state_rows_total | state_rows_removed | watermark")
      rows.foreach { r =>
        println(f"${r.batchId}%5d | ${r.inputRows}%10d | ${r.stateRowsTotal}%16d | " +
          f"${r.stateRowsRemoved}%18d | ${r.watermark}")
      }
      val dataBatches = rows.filter(_.inputRows > 0)
      val peak = dataBatches.map(_.stateRowsTotal).max
      val totalIn = dataBatches.map(_.inputRows).sum
      println(f"peak state rows = $peak (vs $totalIn total input rows; " +
        f"peak/input = ${peak.toDouble / totalIn}%.4f)")
    }
    spark.stop()
  }
}
