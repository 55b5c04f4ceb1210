package graft

/** Dev-only: dump ONE SparkEntry query to parquet for oracle iteration.
  * Usage: runMain graft.DevDump <sfDir> <outDir> <name> [name2 ...]
  */
object DevDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = GraftSession
      .tuned(org.apache.spark.sql.SparkSession.builder().master("local[8]"),
        shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.sql"),
          sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    spark.stop()
  }
}
