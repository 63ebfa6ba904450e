package graft

import org.apache.spark.sql.SparkSession

/** Local smoke check mirroring the driver's t1 gate: `SparkEntry.entry`
  * must return rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"smoke":"entry","rows":$n}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
