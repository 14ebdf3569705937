package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Ad-hoc: probe PERMISSIVE CSV corrupt-record behavior. */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("csvprobe")
    java.nio.file.Files.writeString(dir.resolve("bad.csv"),
      "n_nationkey,n_name,n_regionkey\n" +
        "not_an_int,BROKEN,9\n" +
        "777,SHORT_ROW\n" +
        "778,OK_ROW,3\n" +
        "779,TYPE_LAST,xx\n" +
        "1,TOO,MANY,COLS\n")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val df = io.Csv.readPermissive(spark, dir.toString, schema)
    df.show(20, truncate = false)
    spark.stop()
  }
}
