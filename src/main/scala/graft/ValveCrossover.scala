package graft

import org.apache.spark.sql.functions._

/** ds_pipeline decontam-valve crossover measurement (r15, verdict-r14
  * item 4): the r14 valve threshold (2M distinct bench-shingle hashes)
  * was a plan-mass argument, not a measurement — sg1000 then showed
  * the ENGAGED valve (broadcast semi-join) beating the membership
  * literal at 2.48M hashes (14.9 vs 17.0 s), leaving the actual
  * crossover unmeasured. This main forces BOTH paths over the same
  * corpus at several benchmark sizes (bench = every m-th document, so
  * distinct-hash count scales with 1/m) and reports the walls
  * (min-of-2 per path per size), so `maxMembershipHashes`' default is
  * data-derived instead of guessed.
  *
  * Usage: runMain graft.ValveCrossover <sfDir> [mods...]
  * (default mods 4096,512,64,16,4; 96g heap at sg scale.)
  */
object ValveCrossover {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: ValveCrossover <sfDir> [mods]")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val mods = (if (args.length >= 2) args(1).split(",").toSeq
                else Seq("4096", "512", "64", "16", "4")).map(_.toLong)
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    docs.count() // page-cache warm
    // scalastyle:off println
    for (m <- mods) {
      val bench = docs.filter(col("doc_id") % m === 0)
      val nHashes = graft.dedup.Dedup
        .benchShingleHashes(bench, "text", 5).count()
      def run(maxMembership: Long): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          graft.mix.Mix.curationPipeline(docs, "doc_id", "source", "text",
              bench, "text", maxMembershipHashes = maxMembership)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        math.min(once(), once())
      }
      // Int.MaxValue - 2 is the clamp ceiling = "never valve"
      val membership = run(Int.MaxValue - 2L)
      val broadcast = run(0L)
      println(s"""{"mod":$m,"bench_hashes":$nHashes,""" +
        s""""membership_wall_sec":$membership,""" +
        s""""broadcast_wall_sec":$broadcast}""")
    }
    // scalastyle:on println
    spark.stop()
  }
}
