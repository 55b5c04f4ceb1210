package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.Streaming

/** Streaming state-at-scale soak (VERDICT r12 item 5): drives each
  * stateful twin with a deterministic high-volume MemoryStream —
  * many keys, key churn (cohorts that go quiet mid-stream), and
  * within-watermark disorder — and reports the state store's MEASURED
  * footprint from `StreamingQueryProgress.stateOperators` against the
  * per-key bound each operator's Scaladoc promises. The parity specs
  * (StreamingSpec) prove the VALUES; this main proves the state does
  * not grow with stream length — the property that decides whether a
  * twin survives a week of 100 TB-scale ingest.
  *
  * Per-twin expected bounds (the Scaladoc contracts):
  *   - sessionize: one SessionState per key with an OPEN session —
  *     peak ≤ live keys; quiet cohorts drain via event-time timeout.
  *   - funnelStream: step times per user persist by SEMANTICS (the
  *     batch funnel has no horizon: a purchase long after its view
  *     still converts) — state rows ≈ distinct users EVER seen, the
  *     honest unbounded-in-users number this soak exists to print.
  *   - stepDetectStream: per-key buffer bounded by 2×window of events;
  *     quiet keys prune via the always-registered timeout.
  *   - diurnalPredictedStream: per-key open-day records inside the
  *     watermark+window horizon (~3 days), independent of stream
  *     length.
  *
  * Emits one JSON line per twin:
  *   {"twin":…,"rows_in":…,"keys":…,"out_rows":…,"peak_state_rows":…,
  *    "final_state_rows":…,"peak_state_bytes":…,"late_dropped":…,
  *    "wall_sec":…}
  *
  * Usage: runMain graft.StreamSoak [usersMult] [--backend=hdfs|rocksdb]
  *        [--twins=sessionize,funnel,step,diurnal]
  * (default mult 1 → ~1M-row sessionize feed; the r13 SCALING.md
  * numbers used the default). `--backend=rocksdb` (r14, verdict-r13
  * item 8) swaps the state store provider to
  * RocksDBStateStoreProvider before any query starts — the off-heap
  * store whose state lives on local disk with a block-cache, the
  * backend that survives state sizes the in-memory HDFS-backed map
  * cannot hold; the soak prints the same peak-state/throughput line
  * per twin so the two backends compare row-for-row at any mult.
  */
object StreamSoak {

  /** Deterministic 64-bit mix (splitmix-shape) for reproducible
    * synthetic streams — no RNG state, same feed every run.
    */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def u01(x: Long): Double =
    (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  private case class SoakMetrics(peakRows: Long, peakBytes: Long,
                                 dropped: Long, finalRows: Long)

  /** Feed chunks in event-time order with deterministic intra-chunk
    * disorder (sort by hash), collecting peak/final state metrics. A
    * single processAllAvailable can run SEVERAL micro-batches (the
    * data batch plus no-data timeout batches), and
    * numRowsDroppedByWatermark is a per-batch counter — so every
    * progress event is drained by batchId, not just lastProgress
    * (sampling the last one under-counts drops and misses mid-chunk
    * state peaks; review finding r13).
    */
  private def drive[A](q: StreamingQuery, stream: MemoryStream[A],
                       chunks: Seq[Seq[A]]): SoakMetrics = {
    var peakRows = 0L; var peakBytes = 0L; var dropped = 0L
    var finalRows = 0L
    var seenBatch = -1L
    chunks.foreach { c =>
      stream.addData(c)
      q.processAllAvailable()
      q.recentProgress.filter(_.batchId > seenBatch)
        .sortBy(_.batchId).foreach { p =>
          seenBatch = p.batchId
          if (p.stateOperators.nonEmpty) {
            val so = p.stateOperators(0)
            peakRows = math.max(peakRows, so.numRowsTotal)
            peakBytes = math.max(peakBytes, so.memoryUsedBytes)
            dropped += so.numRowsDroppedByWatermark
            finalRows = so.numRowsTotal
          }
        }
    }
    SoakMetrics(peakRows, peakBytes, dropped, finalRows)
  }

  @volatile private var backend: String = "hdfs"

  private def report(spark: SparkSession, twin: String, rowsIn: Long,
                     keys: Long, outTable: String,
                     m: SoakMetrics, wall: Double): Unit = {
    val out = spark.table(outTable).count()
    // JVM heap peak SINCE THE LAST REPORT (peaks are reset below after
    // reading, so each twin's line carries its own window rather than
    // the run-wide monotone max — without the reset every twin after
    // the first reports the earlier twin's peak; review finding r14).
    // Still an upper bound built from per-pool maxima at different
    // instants; the cross-backend comparison it feeds only needs the
    // order of magnitude (state-on-heap vs state-off-heap).
    val pools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.stream()
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .toArray.map(_.asInstanceOf[java.lang.management.MemoryPoolMXBean])
    val heapPeak = pools
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum
    pools.foreach(p => try p.resetPeakUsage() catch { case _: Throwable => () })
    // scalastyle:off println
    println(s"""{"twin":"$twin","backend":"$backend","rows_in":$rowsIn,""" +
      s""""keys":$keys,""" +
      s""""out_rows":$out,"peak_state_rows":${m.peakRows},""" +
      s""""final_state_rows":${m.finalRows},"peak_state_bytes":${m.peakBytes},""" +
      s""""late_dropped":${m.dropped},"heap_peak_bytes":$heapPeak,""" +
      s""""rows_per_sec":${math.round(rowsIn / math.max(wall, 1e-9))},""" +
      s""""wall_sec":$wall}""")
    // scalastyle:on println
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val mult = args.filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(1)
    backend = args.collectFirst {
      case a if a.startsWith("--backend=") => a.stripPrefix("--backend=")
    }.getOrElse("hdfs")
    val twinFilter = args.collectFirst {
      case a if a.startsWith("--twins=") =>
        a.stripPrefix("--twins=").split(",").toSet
    }
    def enabled(t: String): Boolean = twinFilter.forall(_.contains(t))
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (backend == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    else require(backend == "hdfs", s"unknown backend $backend")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // ---- sessionize: 20k×mult users, 50 events each over 10 days;
    // cohort churn — users u < 25% stop emitting after day 2 (their
    // open sessions MUST drain via timeout, not linger). Sessions are
    // ~5-event bursts 10 s apart; bursts separated by ≥ 2× the 30 min
    // gap. Chunks are half-days; intra-chunk order is hash-shuffled
    // (disorder within the 1 h watermark).
    if (enabled("sessionize")) {
      val users = 20000L * mult
      val gapMs = 30L * 60 * 1000
      val events = (0L until users).flatMap { u =>
        val lastDay = if (u < users / 4) 2 else 10
        (0 until 50).flatMap { i =>
          val day = i / 5 // 10 bursts of 5, one per day
          if (day >= lastDay) None
          else {
            val burstStart = T0 + day * 86400000L +
              (math.abs(mix(u * 31 + day)) % (20L * 3600 * 1000))
            Some(Streaming.SessionEvent(u,
              ts(burstStart + (i % 5) * 10000L), u01(u * 101 + i)))
          }
        }
      }
      val chunks = events.groupBy(e => e.ts.getTime / 43200000L).toSeq
        .sortBy(_._1).map(_._2.sortBy(e => mix(e.user_id * 7919 + e.ts.getTime)))
      val input = MemoryStream[Streaming.SessionEvent]
      val out = Streaming.sessionize(spark, input.toDS(), gapMs, "1 hour")
      val q = out.writeStream.format("memory").queryName("soak_sessionize")
        .outputMode("append").start()
      try {
        val (m, wall) = timed(drive(q, input, chunks))
        report(spark, "sessionize", events.size.toLong, users,
          "soak_sessionize", m, wall)
      } finally q.stop()
    }

    // ---- funnelStream: 10k×mult users × (view, click, purchase) with
    // 30% noise events; half the users never purchase. Run TWICE: the
    // default (state is SEMANTICALLY per-user-ever-seen — the printed
    // number demonstrates the unbounded-in-users contract, not a leak)
    // and with a 2 h TTL (chains idle past the TTL expire — the
    // production-valve evidence: peak state bounded by users ACTIVE
    // inside the TTL window, final state drained).
    if (enabled("funnel"))
    Seq(None -> "funnelStream", Some(2L * 3600 * 1000) -> "funnelStream_ttl")
      .foreach { case (ttl, twin) =>
      val users = 10000L * mult
      val steps = Seq("view", "click", "purchase")
      val events = (0L until users).flatMap { u =>
        val base = T0 + (math.abs(mix(u)) % (5L * 86400000L))
        val hasPurchase = u % 2 == 0
        Seq(
          Some(Streaming.FunnelEvent(u, ts(base), u * 10, "view")),
          Some(Streaming.FunnelEvent(u, ts(base + 60000), u * 10 + 1, "click")),
          if (hasPurchase)
            Some(Streaming.FunnelEvent(u, ts(base + 120000), u * 10 + 2,
              "purchase"))
          else None,
          Some(Streaming.FunnelEvent(u, ts(base + 180000), u * 10 + 3,
            "scroll"))).flatten
      }
      val chunks = events.groupBy(e => e.ts.getTime / 43200000L).toSeq
        .sortBy(_._1).map(_._2.sortBy(e => mix(e.user_id * 13 + e.event_id)))
      val input = MemoryStream[Streaming.FunnelEvent]
      val out = Streaming.funnelStream(spark, input.toDS(), steps, "1 hour",
        stateTtlMillis = ttl)
      val q = out.writeStream.format("memory").queryName(s"soak_$twin")
        .outputMode("append").start()
      try {
        val (m, wall) = timed(drive(q, input, chunks))
        report(spark, twin, events.size.toLong, users, s"soak_$twin", m, wall)
      } finally q.stop()
    }

    // ---- pairMassStream (r15): 50k×mult docs of 20 tokens from a
    // 50-token vocab across 3 source blocks. The trigram universe is
    // bounded by the CONTENT (≤ 50³ per block), so state rows must
    // plateau at the shingle vocabulary while rows_in keeps growing —
    // the audit-state contract (content-bounded, not stream-length-
    // bounded). NoTimeout is by design: a cumulative audit never
    // forgets a shingle's df; the printed plateau is the honest state
    // number, the funnel convention.
    if (enabled("pairmass")) {
      val docs = (0L until 50000L * mult).map { d =>
        val blk = s"s${math.abs(mix(d)) % 3}"
        val text = (0 until 20)
          .map(i => s"t${math.abs(mix(d * 131 + i)) % 50}").mkString(" ")
        (d, text, blk)
      }
      val chunks = docs.grouped(docs.size / 10 + 1).toSeq
      val input = MemoryStream[(Long, String, String)]
      val out = Streaming.pairMassStream(
        input.toDF().toDF("doc_id", "text", "source"), "text", "source")
      val q = out.writeStream.format("memory").queryName("soak_pairmass")
        .outputMode("append").start()
      try {
        val (m, wall) = timed(drive(q, input, chunks))
        report(spark, "pairmass", docs.size.toLong, 3L, "soak_pairmass",
          m, wall)
      } finally q.stop()
    }

    // ---- stepDetectStream: 2k×mult keys × 200 events at 90 s spacing
    // (window 1 h ⇒ ~40 events per key inside the 2w horizon); 25% of
    // keys go quiet after a quarter of the stream — their buffers must
    // prune via the always-registered timeout.
    if (enabled("step")) {
      val keys = 2000L * mult
      val events = (0L until keys).flatMap { k =>
        val n = if (k < keys / 4) 50 else 200
        (0 until n).map { i =>
          Streaming.StepEvent(k, ts(T0 + i * 90000L),
            if (i < n / 2) u01(k * 53 + i) else 5.0 + u01(k * 53 + i))
        }
      }
      val chunks = events.groupBy(_.ts.getTime / 3600000L).toSeq
        .sortBy(_._1).map(_._2.sortBy(e => mix(e.key * 17 + e.ts.getTime)))
      val input = MemoryStream[Streaming.StepEvent]
      val out = Streaming.stepDetectStream(spark, input.toDS(),
        windowMillis = 3600000L, minPeriods = 3, watermarkDelay = "10 minutes")
      val q = out.writeStream.format("memory").queryName("soak_step")
        .outputMode("append").start()
      try {
        val (m, wall) = timed(drive(q, input, chunks))
        report(spark, "stepDetectStream", events.size.toLong, keys,
          "soak_step", m, wall)
      } finally q.stop()
    }

    // ---- diurnalPredictedStream: 500×mult keys × 10 days × 96
    // 15-minute observations; calibration prefit constants (06h min /
    // 18h max). Open-day state must stay ~3 records/key regardless of
    // stream length.
    if (enabled("diurnal")) {
      val keys = 500L * mult
      val occ = (0L until keys).map(k => k -> (6.0, 18.0)).toMap
      val events = (0L until keys).flatMap { k =>
        (0 until 10 * 96).map { i =>
          Streaming.DiurnalEvent(k, ts(T0 + i * 900000L),
            math.sin(i / 96.0 * 2 * math.Pi) + u01(k * 29 + i) * 0.1)
        }
      }
      val chunks = events.groupBy(_.ts.getTime / 43200000L).toSeq
        .sortBy(_._1).map(_._2.sortBy(e => mix(e.key * 41 + e.ts.getTime)))
      val input = MemoryStream[Streaming.DiurnalEvent]
      val out = Streaming.diurnalPredictedStream(spark, input.toDS(), occ,
        halfWindowHours = 8, watermarkDelay = "1 day")
      val q = out.writeStream.format("memory").queryName("soak_diurnal")
        .outputMode("append").start()
      try {
        val (m, wall) = timed(drive(q, input, chunks))
        report(spark, "diurnalPredictedStream", events.size.toLong, keys,
          "soak_diurnal", m, wall)
      } finally q.stop()
    }

    spark.stop()
  }
}
