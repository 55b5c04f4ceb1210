package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Measures the r15 exact-chain safety surface at scale: the linear
  * [[graft.dedup.Dedup.pairMassAudit]] pre-flight, the full exact
  * chain it predicts, the engaged `maxCandidatePairs` guard's
  * pass-through overhead, and the time-to-refusal when the budget is
  * exceeded. The derived `bytes_per_candidate` (exact chain shuffle
  * write ÷ measured candidate mass) is what calibrates the
  * [[graft.dedup.Dedup.pruneNearDupsAuto]] default budget: budget ×
  * bytes/candidate ≈ the quadratic-stage shuffle a route-to-exact
  * decision commits the cluster to.
  *
  * Phases (resettable task-metrics meter, the LshStageProbe pattern):
  *   1. audit            — pairMassAudit total (collapsed, df-cap 0.5);
  *   2. exact_chain      — blockedJaccardClassed → noop sink;
  *   3. guard_passthrough — same with maxCandidatePairs = mass (the
  *                          budget that just passes);
  *   4. guard_refusal    — maxCandidatePairs = mass − 1: wall to the
  *                          routed error, bytes done before dying.
  *
  * Usage: runMain graft.GuardProbe <sfDir> [audit-only]
  * `audit-only` skips the full exact chain and its pass-through twin —
  * the mode for decades where the exact chain is deliberately
  * unaffordable (sg1000: the audit + refusal numbers ARE the story;
  * running the 1.5 TB-shuffle chain to compare would be the mistake
  * the guard exists to prevent).
  * (96g heap for sg100+ — the SCALING.md memory protocol.)
  */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: GuardProbe <sfDir> [audit-only]")
    val auditOnly = args.length > 1 && args(1) == "audit-only"
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
    // returns the phase's drained shuffle write so callers read bytes
    // AFTER the listener catch-up, never mid-flight
    def phase(name: String)(body: => String): Long = {
      drain()
      shuffleWrite = 0L; shuffleRead = 0L; spillBytes = 0L
      val t0 = System.nanoTime()
      val extra = body
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"""{"phase":"$name","wall_sec":$wall%.2f,""" +
        s""""shuffle_write_bytes":$shuffleWrite,""" +
        s""""shuffle_read_bytes":$shuffleRead,""" +
        s""""disk_spill_bytes":$spillBytes$extra}""")
      shuffleWrite
    }

    val docs = graft.tables.Tables.documents(spark, args(0))

    var mass = 0L
    phase("audit") {
      val r = graft.dedup.Dedup.pairMassAudit(docs, "doc_id", "text",
          "source", shingleN = 3, maxShingleDocFrac = Some(0.5))
        .agg(coalesce(sum(col("candidate_pairs")), lit(0L)),
          coalesce(max(col("max_df")), lit(0L)))
        .collect()(0)
      mass = r.getLong(0)
      s""","candidate_mass":$mass,"max_df":${r.getLong(1)}"""
    }

    // the UNCAPPED audit alongside: on boilerplate-laden corpora the
    // delta between the two IS the df-cap's bound — the number that
    // says "this corpus needs the cap", before anything quadratic runs
    phase("audit_uncapped") {
      val r = graft.dedup.Dedup.pairMassAudit(docs, "doc_id", "text",
          "source", shingleN = 3, maxShingleDocFrac = None)
        .agg(coalesce(sum(col("candidate_pairs")), lit(0L)),
          coalesce(max(col("max_df")), lit(0L)))
        .collect()(0)
      s""","candidate_mass":${r.getLong(0)},"max_df":${r.getLong(1)}"""
    }

    var exactWrite = 0L
    if (!auditOnly) {
      exactWrite = phase("exact_chain") {
        graft.dedup.Dedup.blockedJaccardClassed(docs, "doc_id", "text",
            "source", shingleN = 3, threshold = 0.3,
            maxShingleDocFrac = Some(0.5))
          .write.format("noop").mode("overwrite").save()
        ""
      }

      phase("guard_passthrough") {
        graft.dedup.Dedup.blockedJaccardClassed(docs, "doc_id", "text",
            "source", shingleN = 3, threshold = 0.3,
            maxShingleDocFrac = Some(0.5),
            maxCandidatePairs = Some(mass))
          .write.format("noop").mode("overwrite").save()
        ""
      }
    }

    phase("guard_refusal") {
      val died =
        try {
          graft.dedup.Dedup.blockedJaccardClassed(docs, "doc_id", "text",
              "source", shingleN = 3, threshold = 0.3,
              maxShingleDocFrac = Some(0.5),
              maxCandidatePairs = Some(math.max(mass - 1, 0L)))
            .write.format("noop").mode("overwrite").save()
          false
        } catch { case _: Throwable => true }
      s""","refused":$died"""
    }

    if (!auditOnly) {
      val bpc = if (mass > 0) exactWrite.toDouble / mass else 0.0
      println(f"""{"derived":"bytes_per_candidate","value":$bpc%.1f,""" +
        s""""exact_shuffle_write":$exactWrite,"candidate_mass":$mass}""")
    }
    // scalastyle:on println
    spark.stop()
  }
}
