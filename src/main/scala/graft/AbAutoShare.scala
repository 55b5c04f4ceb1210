package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** A/B of [[graft.dedup.Dedup.pruneNearDupsAuto]]'s SHARED-SCAN mode
  * (r15 backlog item 1) vs the two-scan shape: the router's audit and
  * its exact chain both start from the same class-collapsed capped
  * universe, so the unshared router tokenizes+hashes the corpus once
  * for the audit and again (twice, counting the doc-size aggregate's
  * recompute) for the chain. Shared mode localCheckpoints the universe
  * and feeds every consumer from it. Outputs are identical
  * (DedupSpec pins it); this measures the COST side at any fixture:
  * interleaved passes (S,U,S,U... — the quiet-machine protocol's
  * paired-run idea, so drift hits both variants equally), min wall per
  * variant, plus the byte truth: input bytes read, shuffle write,
  * disk spill per pass, and the checkpointed universe's storage
  * footprint (the number the 100 TB story is about — when it exceeds
  * the corpus bytes, sharing trades a cheap sequential re-read for
  * writing AND re-reading a larger intermediate).
  *
  * Usage: runMain graft.AbAutoShare <sfDir> [passesPerVariant]
  * (scale fixtures need SPARK_DRIVER_MEM=96g like every sg run)
  */
object AbAutoShare {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbAutoShare <sfDir> [passesPerVariant]")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.documents(spark, args(0))
    val statsBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    @volatile var inputBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.attemptNumber == 0) {
          shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          spill += sc.stageInfo.taskMetrics.diskBytesSpilled
          inputBytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        }
    })
    def drain(): Unit = {
      var prev = (shuffleWrite, spill, inputBytes); var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        val cur = (shuffleWrite, spill, inputBytes)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    }
    // one throwaway warm pass (page cache + codegen), not reported
    graft.dedup.Dedup.pruneNearDupsAuto(docs, "doc_id", "text", "source",
        shingleN = 3, threshold = 0.3, maxShingleDocFrac = Some(0.5),
        maxSharedScanInputBytes = 0L)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    drain()
    case class Pass(wall: Double, in: Long, sw: Long, sp: Long, ckpt: Long)
    def onePass(sharedBudget: Long): Pass = {
      shuffleWrite = 0L; spill = 0L; inputBytes = 0L
      val t0 = System.nanoTime()
      // construction is where the eager audit/checkpoint jobs run —
      // read the checkpointed universe's storage footprint here,
      // while the blocks are still registered
      val routed = graft.dedup.Dedup.pruneNearDupsAuto(docs, "doc_id",
        "text", "source", shingleN = 3, threshold = 0.3,
        maxShingleDocFrac = Some(0.5),
        maxSharedScanInputBytes = sharedBudget)
      val ckpt = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      routed.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      drain()
      Pass(wall, inputBytes, shuffleWrite, spill, ckpt)
    }
    val shared = collection.mutable.ArrayBuffer[Pass]()
    val unshared = collection.mutable.ArrayBuffer[Pass]()
    (0 until passes).foreach { _ =>
      shared += onePass(Long.MaxValue)
      unshared += onePass(0L)
    }
    def report(name: String, ps: Seq[Pass]): Unit = {
      val best = ps.minBy(_.wall)
      // scalastyle:off println
      println(s"""{"variant":"$name","passes":${ps.size},""" +
        s""""wall_min_sec":${best.wall},""" +
        s""""walls":[${ps.map(p => f"${p.wall}%.3f").mkString(",")}],""" +
        s""""input_bytes":${best.in},"shuffle_write_bytes":${best.sw},""" +
        s""""disk_spill_bytes":${best.sp},""" +
        s""""checkpoint_storage_bytes":${best.ckpt},""" +
        s""""docs_stats_size_bytes":$statsBytes}""")
      // scalastyle:on println
    }
    report("shared_forced", shared.toSeq)
    report("unshared", unshared.toSeq)
    spark.stop()
  }
}
