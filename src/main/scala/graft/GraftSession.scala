package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the tuning this engine assumes.
  *
  * Local testing runs `local[N]`; at cluster scale the same settings
  * apply except parallelism, which should be ~2-3x total cores. AQE is
  * on so runtime stats re-plan skew joins and coalesce small shuffle
  * partitions — both load-bearing at 100 TB.
  */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
