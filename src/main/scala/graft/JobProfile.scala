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
    val jobOfStage = new ConcurrentHashMap[Int, Int]()
    // per job: accumulated (task time ms, stage names)
    val jobTask = new ConcurrentHashMap[Int, java.lang.Long]()
    val jobStages = new ConcurrentHashMap[Int, String]()
    @volatile var stageTaskTime = 0L // ms of task time across stages
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(e.stageInfos.lastOption.map(_.name))
        .getOrElse("?")
      e.stageInfos.foreach(si => jobOfStage.put(si.stageId, e.jobId))
      jobs.put(e.jobId, Job(e.time, desc = desc))
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      Option(jobs.get(e.jobId)).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val t = e.stageInfo.taskMetrics.executorRunTime
      stageTaskTime += t
      Option(jobOfStage.get(e.stageInfo.stageId)).foreach { j =>
        jobTask.merge(j, t, (a, b) => a + b)
        val nm = e.stageInfo.name.takeWhile(_ != '(').trim +
          s"[${e.stageInfo.numTasks}t,${t / 1000.0}s]"
        jobStages.merge(j, nm, (a, b) => a + " " + b)
        ()
      }
    }
    def clear(): Unit = {
      jobs.clear(); jobOfStage.clear(); jobTask.clear(); jobStages.clear()
      stageTaskTime = 0L
    }
    def report(): Unit = {
      import scala.jdk.CollectionConverters._
      val all = jobs.asScala.toSeq.sortBy(_._1)
      val total = all.map { case (_, j) => math.max(0L, j.end - j.start) }.sum
      println(f"[profile] jobs=${all.size} total-job-wall=${total / 1e3}%.2f s task-time=${stageTaskTime / 1e3}%.2f s")
      all.foreach { case (id, j) =>
        val d = math.max(0L, j.end - j.start)
        if (d >= 20) {
          val tt = Option(jobTask.get(id)).fold(0L)(_.longValue)
          val st = Option(jobStages.get(id)).getOrElse("")
          println(f"[profile]   job $id%4d ${d / 1e3}%7.3f s (task ${tt / 1e3}%6.2f s)  ${j.desc.take(60)} :: ${st.take(180)}")
        }
      }
    }
  }

  /** Samples the MAIN thread's stack every ~15 ms and aggregates the
    * deepest "interesting" frame (graft/spark sql classes), so driver-side
    * time between jobs (analysis, fs walks, planning) becomes visible —
    * the guide §7.3 thread-dump loop, in-process because this sandbox
    * blocks the jstack attach API. */
  final class MainSampler(main: Thread) extends Thread {
    setDaemon(true)
    val counts = new ConcurrentHashMap[String, java.lang.Integer]()
    @volatile var running = true
    @volatile var samples = 0
    override def run(): Unit = while (running) {
      val st = main.getStackTrace
      if (st.nonEmpty) {
        samples += 1
        val frame = st.find { e =>
          val c = e.getClassName
          c.startsWith("graft.") ||
          c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
          c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
          c.startsWith("org.apache.spark.sql.execution") ||
          c.startsWith("org.apache.hadoop.fs") ||
          c.startsWith("org.apache.parquet")
        }.orElse(st.headOption)
        frame.foreach { e =>
          val key = s"${e.getClassName.split('.').takeRight(2).mkString(".")}.${e.getMethodName}"
          counts.merge(key, 1, (a, b) => a + b)
          ()
        }
      }
      Thread.sleep(15)
    }
    def report(top: Int): Unit = {
      import scala.jdk.CollectionConverters._
      println(s"[sampler] $samples samples of the main thread")
      counts.asScala.toSeq.sortBy(-_._2).take(top).foreach { case (k, n) =>
        println(f"[sampler]   $n%5d  $k")
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
        val sampler = new MainSampler(Thread.currentThread())
        sampler.start()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        sampler.running = false
        // listener events drain asynchronously
        Thread.sleep(400)
        println(f"[profile] == $name run $i: $wall%.3f s wall ($rows rows)")
        rec.report()
        sampler.report(25)
      }
    }
    spark.stop()
  }
}
