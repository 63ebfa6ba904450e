package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only perf profiler: run one named query and print a per-Spark-job
  * breakdown (duration, description, stage task totals) so the expensive
  * steps of a multi-commit lifecycle query are visible without the UI.
  * `runMain graft.JobProfile <sfDir> <name> [repeats]` */
object JobProfile {

  final class Recorder extends SparkListener {
    case class Job(start: Long, var end: Long = 0L, desc: String)
    val jobs = new ConcurrentHashMap[Int, Job]()
    @volatile var stageTaskTime = 0L // ms of task time across stages
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      jobs.put(e.jobId, Job(e.time, desc = desc))
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stageTaskTime += e.stageInfo.taskMetrics.executorRunTime
    }
    def clear(): Unit = { jobs.clear(); stageTaskTime = 0L }
    def report(): Unit = {
      import scala.jdk.CollectionConverters._
      val all = jobs.asScala.toSeq.sortBy(_._1)
      val total = all.map { case (_, j) => math.max(0L, j.end - j.start) }.sum
      println(f"[profile] jobs=${all.size} total-job-wall=${total / 1e3}%.2f s task-time=${stageTaskTime / 1e3}%.2f s")
      all.foreach { case (id, j) =>
        val d = math.max(0L, j.end - j.start)
        if (d >= 20)
          println(f"[profile]   job $id%4d ${d / 1e3}%7.3f s  ${j.desc.take(160)}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val repeats = if (args.length > 2) args(2).toInt else 1
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
    Seq("lineitem", "documents", "embeddings", "events").foreach(t =>
      graft.queries.Tables.load(spark, sfDir, t).limit(1).collect())
    val rec = new Recorder
    spark.sparkContext.addSparkListener(rec)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeats).foreach { i =>
        rec.clear()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously
        Thread.sleep(400)
        println(f"[profile] == $name run $i: $wall%.3f s wall ($rows rows)")
        rec.report()
      }
    }
    spark.stop()
  }
}
