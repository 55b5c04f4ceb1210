package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a set of declared queries.
  *
  * - `SPARK_GRAFT_PLANS`      comma-separated query keys (default: a
  *                            representative sample).
  * - `SPARK_GRAFT_PLAN_DIR`   sf data dir (default /root/testdata/sf0.1 —
  *                            the driver's bench scale, so size-driven
  *                            planner choices like broadcast thresholds
  *                            match what the bench actually runs).
  * - `SPARK_GRAFT_PLAN_OUT`   output directory; each query writes
  *                            `<out>/<name><SPARK_GRAFT_PLAN_SUFFIX>.txt`
  *                            (suffix default ""), plus a combined
  *                            /tmp/plans.txt for quick reading.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/testdata/sf0.1")
    val out = sys.env.get("SPARK_GRAFT_PLAN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val picks = sys.env.get("SPARK_GRAFT_PLANS").map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg", "q3_join", "ts_rolling_center", "ts_asof_join",
        "diurnal_minfirst", "dedup_minhash", "ann_ivf", "q_sessionize"))
    val sb = new StringBuilder
    picks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"===== $name =====\n").append(plan).append("\n")
      out.foreach { o =>
        Files.createDirectories(Paths.get(o))
        Files.writeString(Paths.get(o, s"$name$suffix.txt"),
          s"== $name @ $dir ==\n$plan")
      }
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), sb.toString)
    spark.stop()
  }
}
