package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Straggler probe for the skew fixtures (r15, verdict-r14 item 5):
  * BENCH_LOCAL_sg10_skew_subset.json existed since r13 but no artifact
  * showed per-TASK skew — whether the hot key (30% of events on one
  * user, 2% of documents on one source under ScaleGen --skew) turns
  * into one straggler task that owns the wall. This main runs named
  * queries with a task-duration listener and reports, per query, the
  * distribution the wall clock hides: max/p50 task duration and the
  * straggler ratio (max/p50 across the run's largest stage), plus
  * per-task max/median shuffle-read rows of that stage — the direct
  * skew evidence (a straggler from data skew reads more rows; a
  * straggler from CPU noise does not).
  *
  * Usage: runMain graft.StragglerProbe <sfDir> <q1,q2,...>
  */
object StragglerProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StragglerProbe <sfDir> <q1,q2,...>")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val keys = args(1).split(",").toSeq

    // (stageId, durationMs, shuffleReadRecords) per task
    val tasks = ArrayBuffer.empty[(Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) tasks.synchronized {
          tasks += ((te.stageId, te.taskInfo.duration,
            te.taskMetrics.shuffleReadMetrics.recordsRead))
        }
    })
    def drain(): Unit = Thread.sleep(2000)

    // scalastyle:off println
    for (key <- keys) {
      tasks.synchronized(tasks.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val byStage = tasks.synchronized(tasks.toVector).groupBy(_._1)
      if (byStage.nonEmpty) {
        // the stage that owns the most task-time is where skew bites
        val (sid, st) = byStage.maxBy(_._2.map(_._2).sum)
        val durs = st.map(_._2).sorted
        val rows = st.map(_._3).sorted
        def p50(v: Vector[Long]): Long = v(v.size / 2)
        val maxD = durs.last; val medD = math.max(p50(durs), 1L)
        println(s"""{"query":"$key","sf":"$dir","wall_sec":$wall,""" +
          s""""largest_stage_tasks":${st.size},""" +
          s""""task_ms_max":$maxD,"task_ms_p50":${p50(durs)},""" +
          s""""straggler_ratio":${maxD.toDouble / medD},""" +
          s""""task_shuffle_rows_max":${rows.last},""" +
          s""""task_shuffle_rows_p50":${p50(rows)}}""")
      }
    }
    // scalastyle:on println
    spark.stop()
  }
}
