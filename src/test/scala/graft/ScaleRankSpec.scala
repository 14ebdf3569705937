package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScaleRank

/** ScaleRank's contract is bit-equality with the single-partition
  * spellings it replaces. Exercise it against Window.orderBy ground
  * truth over seeded random data dense with ties — the case where a
  * wrong range assignment or offset would surface instantly.
  */
class ScaleRankSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // values drawn from a tiny domain → heavy ties at every cutpoint
    (1 to n).map(i => (i.toLong, rnd.nextInt(17).toLong - 8))
      .toDF("k", "v")
  }

  test("withGlobalRank == global-sort row_number/running sum, asc and desc") {
    for (seed <- Seq(1L, 2L, 3L); desc <- Seq(false, true)) {
      val df = randomDf(seed, 500)
      val w = Window.orderBy(if (desc) col("v").desc else col("v").asc, col("k"))
      val expected = df
        .withColumn("rk_exp", row_number().over(w).cast("long"))
        .withColumn("run_exp", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val got = ScaleRank.withGlobalRank(df, "v", "k", descending = desc,
        nRanges = 8, runOn = Some("v"))
      val joined = expected.join(got.withColumnRenamed("v", "v2"), "k")
      assert(joined.filter(col("rk") =!= col("rk_exp") ||
        col("run") =!= col("run_exp")).count() == 0,
        s"seed=$seed desc=$desc")
    }
  }

  test("ntileFromRank == ntile for every (n, b) shape incl. n < b") {
    for (n <- Seq(1, 4, 7, 10, 23, 100); b <- Seq(1, 3, 4, 5, 10)) {
      val df = (1 to n).map(_.toLong).toDF("k")
      val w = Window.orderBy("k")
      val bad = df
        .withColumn("exp", ntile(b).over(w).cast("long"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("got", ScaleRank.ntileFromRank(col("rk"), lit(n.toLong), b))
        .filter(col("exp") =!= col("got")).count()
      assert(bad == 0, s"n=$n b=$b")
    }
  }

  test("partitionedRunningSum == per-partition window, tie-heavy buckets") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 600).map { i =>
      (s"src${i % 3}", i.toLong, rnd.nextInt(50).toLong)
    }.toDF("src", "id", "tok")
    val w = Window.partitionBy("src").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum_exp", sum(col("tok")).over(w))
    val got = ScaleRank.partitionedRunningSum(df, "src", Seq("id"), "tok",
      floor(col("id") / 32L), "cum")
    val joined = expected.join(
      got.select(col("src").as("s2"), col("id").as("id2"), col("cum")),
      col("src") === col("s2") && col("id") === col("id2"))
    assert(joined.filter(col("cum") =!= col("cum_exp")).count() == 0)
  }
}
