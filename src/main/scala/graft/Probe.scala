package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe (dev only): time named queries N times in one session.
  * `runMain graft.Probe <sfDir> <n> <name,name,...>` */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      }
    }
    spark.stop()
  }
}
