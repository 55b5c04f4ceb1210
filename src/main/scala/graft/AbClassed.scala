package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** A/B of [[graft.dedup.Dedup.blockedJaccardClassed]] vs the plain
  * [[graft.dedup.Dedup.blockedJaccard]] on a DUPLICATE-HEAVY corpus
  * (r14): the sg fixtures plant their exact-dup copies ACROSS sources
  * (ScaleGen.documents pmod(id,1000) tids with independent source
  * assignment), so the source-blocked jaccard family sees almost no
  * identical classes there (sg100: 1,273 globally-identical docs but
  * only 105 same-source — measured r14) and the class-collapse has
  * nothing to collapse. Real web-crawl corpora put their copy mass
  * INSIDE a source (mirrored spam, boilerplate re-posts), which is the
  * regime the collapse exists for. This main constructs that regime
  * from driver testdata without inventing text: each document is
  * unioned with `copies` identical same-source copies at shifted ids —
  * identical-class size = copies+1 per class, Σ df² over copies =
  * (copies+1)² × the base mass. Uncapped, where classed ≡ plain is
  * spec-pinned, so the A/B is plan cost alone at IDENTICAL output.
  *
  * Usage: runMain graft.AbClassed <sfDir> [copies] [threshold]
  */
object AbClassed {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AbClassed <sfDir> [copies] [threshold]")
    val copies = args.lift(1).map(_.toInt).getOrElse(3)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.3)
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.tables.Tables.documents(spark, args(0))
      .select(col("doc_id"), col("text"), col("source"))
    val shift = 100000000000L
    val dup = (1 to copies).map(k =>
        base.select((col("doc_id") + k * shift).as("doc_id"), col("text"),
          col("source")))
      .foldLeft(base)(_ unionByName _)
      .localCheckpoint(true)
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.attemptNumber == 0) {
          shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          spill += sc.stageInfo.taskMetrics.diskBytesSpilled
        }
    })
    def run(name: String, pairs: => org.apache.spark.sql.DataFrame): Unit = {
      val walls = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        pairs.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      var prev = (shuffleWrite, spill); var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        val cur = (shuffleWrite, spill)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      // scalastyle:off println
      println(s"""{"variant":"$name","copies":$copies,""" +
        s""""threshold":$threshold,"wall_min2_sec":${walls.min},""" +
        s""""shuffle_write_bytes_2runs":$shuffleWrite,""" +
        s""""disk_spill_bytes_2runs":$spill}""")
      // scalastyle:on println
      shuffleWrite = 0L; spill = 0L
    }
    run("blockedJaccard_plain", graft.dedup.Dedup.blockedJaccard(
      dup, "doc_id", "text", "source", shingleN = 3, threshold = threshold))
    run("blockedJaccardClassed", graft.dedup.Dedup.blockedJaccardClassed(
      dup, "doc_id", "text", "source", shingleN = 3, threshold = threshold))
    spark.stop()
  }
}
