package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev measurement tool (guide §1): run ONE corpus query and print its
  * Spark JOB census — job count, per-job wall time, and stage shuffle
  * bytes — so "where does this query's time go" is answered by
  * listener data instead of guesses. Two timed runs (cold, warm) to
  * separate scan/JIT effects from steady-state cost.
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir] [cpus]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [sfDir] [cpus]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query $name"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, t0: Long, var t1: Long = 0L,
        var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.put(js.jobId, Job(js.jobId, js.time))
        js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.t1 = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(sc.stageInfo.stageId, -1)
        Option(jobs.get(jid)).foreach { j =>
          j.shuffleRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }

    def runOnce(label: String): Unit = {
      jobs.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      spark.sparkContext.setJobDescription(s"profile:$name")
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.values.toArray(Array.empty[Job]).sortBy(_.id)
      val totalJob = js.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      println(f"PROFILE $name $label wall=$wall%.2fs jobs=${js.length} jobTimeSum=$totalJob%.2fs")
      js.foreach { j =>
        val d = math.max(0L, j.t1 - j.t0) / 1e3
        if (d >= 0.05)
          println(f"  job ${j.id}%4d  ${d}%7.2fs  shufR=${j.shuffleRead / 1048576.0}%8.1fMB shufW=${j.shuffleWrite / 1048576.0}%8.1fMB")
      }
    }
    runOnce("cold")
    runOnce("warm")
    spark.stop()
  }
}
