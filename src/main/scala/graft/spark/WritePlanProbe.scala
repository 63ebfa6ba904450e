package graft.spark

import org.apache.spark.sql.SparkSession

/** Dev-only: print the physical plan `VersionContext.distributeForWrite`
  * hands the writer for (a) a small input — below one advisory-sized
  * output file — and (b) a large input, so the size-gate's branch choice
  * is auditable without the Spark UI.
  * `runMain graft.spark.WritePlanProbe <sfDir>` */
object WritePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.FormattedMode

    // (a) the fragmentation case round 20 measured: a persisted aggregate
    // (cached plans pin their output partitioning) written partitioned
    val small = graft.queries.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"))
      .persist()
    small.count()
    println("=== small input (persisted agg, est <= advisory) ===")
    println(VersionContext.distributeForWrite(small, Seq("l_returnflag"))
      .queryExecution.explainString(FormattedMode))

    // (b) a large input (unioned scans push the estimate well above one
    // advisory-sized file): the hash rebalance must stay
    val one = graft.queries.Tables.load(spark, sfDir, "lineitem")
    val big = Seq.fill(8)(one).reduce(_ union _)
    println("=== large input (scan, est > advisory) ===")
    println(VersionContext.distributeForWrite(big, Seq("l_returnflag"))
      .queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
