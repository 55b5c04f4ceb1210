package graft

import org.apache.spark.sql.functions._

/** Scale diagnostics for the near-dup family: states the MASS a
  * fixture implies — fingerprint class-size distribution, block-bucket
  * fan-out, implied identical-pair output, capped-run wall time —
  * WITHOUT running the full pair expansion. This is how a wall-growth
  * reading (e.g. dedup_hamming's mult=1000 decade) gets attributed to
  * candidate/output mass vs a plan defect, in minutes instead of a
  * 50-minute re-run.
  *
  * Usage:
  *   runMain graft.Probe <sfDir> stats          — class + bucket mass
  *   runMain graft.Probe <sfDir> capped <cap>   — timed capped hamming run
  *   runMain graft.Probe x radius <nStations>   — constant-density
  *     spread-network timing of stationDistancesWithin (dir unused)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args.lift(1).getOrElse("stats")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    lazy val docs = graft.tables.Tables.documents(spark, dir)
    mode match {
      case "stats" =>
        val fp = graft.dedup.Dedup.fingerprintWords(docs, "doc_id", "text")
        val classes = fp.groupBy(col("_lo"), col("_hi"))
          .agg(count(lit(1)).as("csize")).persist()
        try {
          val c = classes.agg(
            count(lit(1)).as("n_classes"), sum(col("csize")).as("n_docs"),
            max(col("csize")).as("max_class"),
            sum(col("csize") * (col("csize") - 1) / 2).as("identical_pairs"))
            .collect()(0)
          // the class block join's candidate mass: sum over (blk, bv)
          // buckets of C(m, 2) — computed from the bucket histogram,
          // never by joining
          val nBlocks = graft.dedup.Dedup.hammingBlockCount(3)
          val buckets = graft.dedup.Dedup.bandedFingerprints(
              classes.select(lit(0L).as("doc_id"), col("_lo"), col("_hi")),
              nBlocks, "")
            .groupBy(col("blk"), col("bv")).agg(count(lit(1)).as("m"))
            .persist()
          try {
            val b = buckets.agg(
              sum(col("m") * (col("m") - 1) / 2).as("cand_mass"),
              max(col("m")).as("max_bucket")).collect()(0)
            val top = buckets.orderBy(col("m").desc).limit(5).collect()
              .map(r => s"""{"blk":${r.get(0)},"bv":${r.get(1)},"m":${r.get(2)}}""")
              .mkString("[", ",", "]")
            println(s"""{"dir":"$dir","n_docs":${c.get(1)},"n_classes":${c.get(0)},""" +
              s""""max_class":${c.get(2)},"identical_pairs":${c.get(3)},""" +
              s""""class_join_cand_mass":${b.get(0)},"max_bucket":${b.get(1)},""" +
              s""""top_buckets":$top}""")
          } finally buckets.unpersist()
        } finally classes.unpersist()
      case "radius" =>
        // spread-network demonstration for stationDistancesWithin: n
        // stations uniform over a box whose AREA grows with n (constant
        // density ~1 station per unit², like a physical network), radius
        // 1.0 — output per station is constant, so the valve should run
        // ~linearly in n where the all-pairs form is C(n,2). Positions
        // are pure xxhash64 functions of the id (ScaleGen's trick).
        val n = args(2).toLong
        val side = math.sqrt(n.toDouble)
        def u(salt: Int) = (pmod(xxhash64(col("id"), lit(salt)),
          lit(1000000L)).cast("double") + 0.5) / 1000000.0
        val st = spark.range(0, n, 1, 32).select(
          col("id").cast("string").as("k"),
          (u(1) * side).as("dnorth"), (u(2) * side).as("deast"),
          lit("2024-01-10 00:00:00").cast("timestamp").as("ts"))
        val t0 = System.nanoTime()
        val pairs = graft.operators.Gps.stationDistancesWithin(st, Seq("k"),
          "ts", "dnorth", "deast", "2024-01-01", "2024-02-01", 1.0).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"dir":"synthetic","n_stations":$n,"pairs":$pairs,"sec":$sec}""")
      case "capped" =>
        val cap = args(2).toInt
        val t0 = System.nanoTime()
        val n = graft.dedup.Dedup.hammingNearDup(docs, "doc_id", "text",
          maxHamming = 3, maxBucketSize = cap).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"""{"dir":"$dir","cap":$cap,"pairs":$n,"sec":$sec}""")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
