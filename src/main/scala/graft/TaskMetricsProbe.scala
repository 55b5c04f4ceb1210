package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Deterministic plan-cost probe (r13): runs one registered query to
  * the noop sink with a task-metrics listener and prints the numbers
  * wall clocks can't fake — input records (scan count × table size),
  * shuffle bytes written, peak execution memory. Scale-fixture wall
  * clocks on this box ranged 33-101 s for IDENTICAL code across
  * quiet/loaded runs (SCALING.md r13 ts_mad note); these metrics are
  * repeatable to the byte, so a rework's claimed scan/exchange saving
  * is verified HERE, and the wall clock is only corroboration.
  *
  * Usage: runMain graft.TaskMetricsProbe <sfDir> <queryKey>
  */
object TaskMetricsProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TaskMetricsProbe <sfDir> <queryKey>")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var inputRecords = 0L
    @volatile var inputBytes = 0L
    @volatile var spillBytes = 0L
    @volatile var nStages = 0L
    @volatile var nTasks = 0L
    @volatile var nJobs = 0L
    // SPARK_GRAFT_JOBS=1 additionally prints one line per Spark job
    // (wall, stage count) — the stage-floor attribution view (r16)
    val perJob = sys.env.get("SPARK_GRAFT_JOBS").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        nJobs += 1
        jobStart.put(js.jobId, System.nanoTime())
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) {
          val t0 = jobStart.getOrDefault(je.jobId, 0L)
          // scalastyle:off println
          println(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
          // scalastyle:on println
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        // first attempt only: stage/task retries re-run the same work,
        // and summing every attempt would double-count input/shuffle
        // bytes — breaking the "repeatable to the byte" contract on a
        // run that happened to hit a fetch failure
        if (sc.stageInfo.attemptNumber == 0) {
          val m = sc.stageInfo.taskMetrics
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          inputRecords += m.inputMetrics.recordsRead
          nStages += 1
          nTasks += sc.stageInfo.numTasks
          inputBytes += m.inputMetrics.bytesRead
          spillBytes += m.diskBytesSpilled
        }
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(args(1))(spark, args(0))
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener events are queued on a bus thread (the bus API is
    // private): poll until the counters are stable across two
    // consecutive reads rather than trusting a fixed sleep, which can
    // under-drain on a loaded machine
    def snap() = (shuffleWrite, shuffleRead, inputRecords, inputBytes,
      spillBytes, nStages, nTasks, nJobs)
    var prev = snap()
    var stable = 0
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (stable < 2 && System.nanoTime() < deadline) {
      Thread.sleep(250)
      val cur = snap()
      if (cur == prev) stable += 1 else { stable = 0; prev = cur }
    }
    // scalastyle:off println
    println(s"""{"query":"${args(1)}","sf":"${args(0)}",""" +
      s""""input_records":$inputRecords,"input_bytes":$inputBytes,""" +
      s""""shuffle_write_bytes":$shuffleWrite,""" +
      s""""shuffle_read_bytes":$shuffleRead,""" +
      s""""disk_spill_bytes":$spillBytes,""" +
      s""""n_jobs":$nJobs,"n_stages":$nStages,"n_tasks":$nTasks,""" +
      s""""wall_sec":$wall}""")
    // scalastyle:on println
    spark.stop()
  }
}
