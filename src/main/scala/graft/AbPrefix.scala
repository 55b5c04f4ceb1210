package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** A/B of dedup_prune's CANDIDATE STAGE (r14, verdict-r13 item 3):
  * the plain (blk, shingle) equi-join [[graft.dedup.Dedup.blockedJaccard]]
  * vs the prefix-filtered [[graft.dedup.Dedup.blockedJaccardPrefix]]
  * (AllPairs/PPJoin — lossless, equality spec-pinned), both run over
  * the SAME class-collapsed representatives the prune chain feeds its
  * verify join (the r13 collapse window, inlined here), uncapped
  * (the prefix variant carries no df-cap; equality holds only for
  * maxShingleDocFrac = None). Downstream (components + anti-join) is
  * identical either way, so the pair stage IS the A/B.
  *
  * Emits one JSON line per variant with min-of-2 wall and
  * first-attempt task metrics (input records, shuffle bytes, spill) —
  * the numbers that decide keep-or-reject for the prune chain.
  *
  * Usage: runMain graft.AbPrefix <sfDir> [threshold]
  */
object AbPrefix {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbPrefix <sfDir> [threshold]")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.documents(spark, args(0))
    // the prune chain's collapse window, inlined (pruneNearDups keeps
    // it private to its lineage)
    val wClass = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), coalesce(sha2(col("text"), 256),
        concat(lit("_null_"), col("doc_id"))))
    val reps = docs.withColumn("_rep", min(col("doc_id")).over(wClass))
      .filter(col("doc_id") === col("_rep")).drop("_rep")
      .localCheckpoint(true) // isolate the A/B from the collapse cost
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    @volatile var inputRecords = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.attemptNumber == 0) {
          val m = sc.stageInfo.taskMetrics
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          spill += m.diskBytesSpilled
          inputRecords += m.inputMetrics.recordsRead
        }
    })
    def run(name: String, pairs: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        pairs.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // settle the listener bus (TaskMetricsProbe's poll-to-stable)
      var prev = (shuffleWrite, spill, inputRecords); var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        val cur = (shuffleWrite, spill, inputRecords)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      // scalastyle:off println
      println(s"""{"variant":"$name","threshold":$threshold,""" +
        s""""wall_min2_sec":${walls.min},""" +
        s""""shuffle_write_bytes_2runs":$shuffleWrite,""" +
        s""""disk_spill_bytes_2runs":$spill,""" +
        s""""input_records_2runs":$inputRecords}""")
      // scalastyle:on println
      shuffleWrite = 0L; spill = 0L; inputRecords = 0L
    }
    run("blockedJaccard", graft.dedup.Dedup.blockedJaccard(
      reps, "doc_id", "text", "source", shingleN = 3, threshold = threshold))
    run("blockedJaccardPrefix", graft.dedup.Dedup.blockedJaccardPrefix(
      reps, "doc_id", "text", "source", shingleN = 3, threshold = threshold))
    spark.stop()
  }
}
