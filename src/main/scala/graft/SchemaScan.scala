package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, MapType}

/** Dev tool: list registered queries whose output schema contains
  * array/map columns — the driver's pandas compare can't sort those, so
  * they fail even the rows-only check. */
object SchemaScan {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.foreach { q =>
      try {
        val bad = q.fn(spark, d).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] => s"${f.name}:${f.dataType.simpleString}"
        }
        if (bad.nonEmpty) println(s"ARRAYCOL ${q.name} -> ${bad.mkString(", ")}")
      } catch { case e: Throwable => println(s"SCHEMAFAIL ${q.name}: ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
