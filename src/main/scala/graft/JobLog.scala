package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool (attach with `-Dspark.extraListeners=graft.JobLog`): one
  * stderr line per Spark job — start offset, duration, task count,
  * description — so a query's wall clock decomposes into job time vs
  * the gaps between jobs (driver-side planning/codegen/scheduling).
  * The r18 sub-second-tail attribution ran on this; it is never on
  * the timed path (the driver's Bench invocation doesn't set it).
  */
class JobLog extends SparkListener {
  private val t0 = System.nanoTime()
  private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val desc = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
    val nTasks = js.stageInfos.map(_.numTasks).sum
    starts.put(js.jobId, (System.nanoTime(), nTasks, desc))
  }

  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    Option(starts.remove(je.jobId)).foreach { case (s, nTasks, desc) =>
      val off = (s - t0) / 1e9
      val dur = (System.nanoTime() - s) / 1e9
      System.err.println(
        f"JOBLOG id=${je.jobId} off=$off%.3f dur=$dur%.3f tasks=$nTasks desc=$desc")
    }
  }
}
