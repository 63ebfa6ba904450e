package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_ONLY=q01,e13 restricts the dump (driver unset → all)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // dev gate: SPARK_GRAFT_DETERMINISM=1 replaces the dump with a
    // double-run — each query is built and collected twice under different
    // shuffle partitioning (different partial-agg merge trees, so a float
    // summation-order-dependent output diverges) and the sorted row sets
    // are compared exactly. Catches round(avg(double)) boundary-sitters
    // (the round-8 e26 flake class) before the driver's oracle does.
    if (sys.env.get("SPARK_GRAFT_DETERMINISM").contains("1")) {
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
      val bad = names.flatMap { name =>
        val fn = SparkEntry.queries(name)
        def runOnce(parts: String): Seq[String] = {
          spark.conf.set("spark.sql.shuffle.partitions", parts)
          graft.queries.Pipeline.clearStageCache()
          try fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
          finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
        }
        try {
          val a = runOnce(cpus)
          // alternate partition count must actually differ from cpus, or
          // both runs share one merge tree and the gate is vacuous
          val b = runOnce(if (cpus == "5") "7" else "5")
          val diff = a.zipAll(b, "<missing>", "<missing>").find(p => p._1 != p._2)
          diff match {
            case Some((x, y)) =>
              System.err.println(s"[determinism] $name MISMATCH: $x != $y")
              Some(name)
            case None =>
              println(s"[determinism] $name stable (${a.size} rows)"); None
          }
        } catch { case e: Throwable =>
          System.err.println(s"[determinism] $name failed: ${e.getMessage}")
          Some(name)
        }
      }
      println(s"[determinism] ${names.size - bad.size}/${names.size} stable")
      spark.stop()
      if (bad.nonEmpty) sys.exit(1) else return
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
