package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-attributed probe of the dedup_prune_lsh chain (r15,
  * verdict-r14 item 1): the flagship's sg100 → sg1000 growth was
  * 4.3-6.3x/decade — the only superlinear grower left on a flagship
  * scale path — and the whole-query TaskMetricsProbe cannot say
  * whether the residue is CC rounds, the banded-candidate verify, or
  * output write. This main materializes each stage EAGERLY behind a
  * resettable task-metrics meter, so every stage's bytes are its own:
  *
  *   1. candidates — banded signatures → capped bucket pairs
  *      ([[graft.dedup.Dedup.lshCandidates]], checkpoint included);
  *   2. verify — exact-Jaccard join over candidate docs only
  *      ([[graft.dedup.Dedup.lshVerifiedPairs]]), checkpointed here so
  *      CC variants below read pairs, not the verify lineage;
  *   3. cc_pd_distributed — pointer-doubling
  *      [[graft.dedup.Dedup.connectedComponents]] with the driver
  *      cutoff DISABLED (the distributed loop is what scales; round
  *      count reported);
  *   3b. cc_lss — [[graft.dedup.Dedup.connectedComponentsLargeSmallStar]]
  *      on the SAME pair graph (the r5 A/B ran on the sf0.1 dup graph;
  *      this is the sg-scale regime where LS/SS's less-data-motion
  *      claim was untested);
  *   3c. cc_driver_cutoff — the default driver cutoff, for the
  *      small-graph comparison;
  *   4. anti_join_noop — drop list → left_anti against the corpus →
  *      noop sink.
  *
  * Usage: runMain graft.LshStageProbe <sfDir>
  * (96g heap for sg100/sg1000 — memory/SCALING.md protocol.)
  */
object LshStageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: LshStageProbe <sfDir>")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    @volatile var shuffleRead = 0L
    @volatile var spillBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.attemptNumber == 0) {
          val m = sc.stageInfo.taskMetrics
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          spillBytes += m.diskBytesSpilled
        }
    })
    // listener events land on a bus thread: poll until stable across
    // two consecutive reads (the TaskMetricsProbe drain convention)
    def drain(): Unit = {
      var prev = (shuffleWrite, shuffleRead, spillBytes)
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val cur = (shuffleWrite, shuffleRead, spillBytes)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
    }
    // scalastyle:off println
    def stage(name: String)(body: => Long): Unit = {
      drain()
      shuffleWrite = 0L; shuffleRead = 0L; spillBytes = 0L
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(s"""{"stage":"$name","rows":$rows,"wall_sec":$wall,""" +
        s""""shuffle_write_bytes":$shuffleWrite,""" +
        s""""shuffle_read_bytes":$shuffleRead,""" +
        s""""disk_spill_bytes":$spillBytes}""")
    }

    val dir = args(0)
    val docs = graft.tables.Tables.documents(spark, dir)
    docs.count() // warm the page cache out of stage 1's wall

    import graft.dedup.Dedup
    var cand: DataFrame = null
    stage("candidates") {
      cand = Dedup.lshCandidates(docs, "doc_id", "text", shingleN = 3,
        numHashes = 64, bands = 16, maxBucketSize = 10000)
      cand.count()
    }
    var pairs: DataFrame = null
    stage("verify") {
      pairs = Dedup.lshVerifiedPairs(docs, "doc_id", "text", shingleN = 3,
        threshold = 0.7, cand).localCheckpoint(true)
      pairs.count()
    }
    val pdRounds = new AtomicInteger(0)
    stage("cc_pd_distributed") {
      Dedup.connectedComponents(pairs, "doc_a", "doc_b",
        driverEdgeBound = 0L, roundCounter = Some(pdRounds)).count()
    }
    println(s"""{"stage":"cc_pd_distributed_rounds","rounds":${pdRounds.get}}""")
    val lssRounds = new AtomicInteger(0)
    stage("cc_lss") {
      Dedup.connectedComponentsLargeSmallStar(pairs, "doc_a", "doc_b",
        roundCounter = Some(lssRounds)).count()
    }
    println(s"""{"stage":"cc_lss_rounds","rounds":${lssRounds.get}}""")
    stage("cc_driver_cutoff") {
      Dedup.connectedComponents(pairs, "doc_a", "doc_b").count()
    }
    stage("anti_join_noop") {
      val dropIds = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      docs.join(dropIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .write.format("noop").mode("overwrite").save()
      -1L
    }
    // scalastyle:on println
    spark.stop()
  }
}
