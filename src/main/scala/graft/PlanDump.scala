package graft
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = sys.env.get("SPARK_GRAFT_PLANS").map(_.split(",").toSeq)
      .getOrElse(Seq("q1_agg", "q3_join", "ts_rolling_center", "ts_asof_join",
        "diurnal_minfirst", "dedup_minhash", "ann_ivf", "q_sessionize"))
    val sb = new StringBuilder
    picks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      sb.append(s"===== $name =====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), sb.toString)
    spark.stop()
  }
}
