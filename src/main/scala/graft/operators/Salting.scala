package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY §5).
  *
  * AQE's skew-join splitting handles most runtime skew; these are for
  * the cases planned around it: a handful of keys carrying a large
  * share of rows (one mega-user's series, one boilerplate document
  * cluster) where even a single reducer partition per key is too much.
  *
  * Salted aggregation is two-phase: rows are spread over
  * `saltBuckets` sub-keys (deterministic hash of a spread column), a
  * partial aggregate runs per (key, salt), and a final aggregate merges
  * the partials per key. Works for any algebraic aggregate
  * (sum/count/min/max/avg-via-sum+count).
  */
object Salting {

  /** Two-phase salted sum/count/min/max aggregation.
    *
    * @param spreadCol any column with per-row variation (an id,
    *        timestamp); the salt is its hash mod saltBuckets so the
    *        result stays deterministic (no rand()).
    * @param aggs (outputName, valueColumn, "sum"|"count"|"min"|"max")
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], spreadCol: String,
                saltBuckets: Int, aggs: Seq[(String, String, String)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(spreadCol)), lit(saltBuckets)))
    val partialCols = aggs.map { case (name, valCol, how) =>
      val c = col(valCol)
      (how match {
        case "sum" => sum(c)
        case "count" => count(c)
        case "min" => min(c)
        case "max" => max(c)
      }).as(s"_p_$name")
    }
    val partial = salted
      .groupBy(keys.map(col) :+ col("_salt"): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (name, _, how) =>
      val p = col(s"_p_$name")
      (how match {
        case "sum" | "count" => sum(p) // counts merge by summing partials
        case "min" => min(p)
        case "max" => max(p)
      }).as(name)
    }
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }

  /** Salted broadcast-side replication for joining a skewed fact to a
    * small dim: the fact side gets a deterministic salt, the dim side
    * is exploded across all salt values, and the join key becomes
    * (key, salt) — splitting each hot key across saltBuckets reducers.
    * Only sensible when `dim` is broadcast-small (it is replicated
    * saltBuckets times).
    */
  def saltedJoinSmall(fact: DataFrame, dim: DataFrame, key: String,
                      spreadCol: String, saltBuckets: Int): DataFrame = {
    val factS = fact.withColumn("_salt",
      pmod(xxhash64(col(spreadCol)), lit(saltBuckets)))
    val dimS = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    factS.join(broadcast(dimS), Seq(key, "_salt")).drop("_salt")
  }

  /** The skew DIAGNOSIS that precedes the mitigation above: the topK
    * heaviest keys with their row counts and share of the corpus —
    * what you read before deciding a key needs salting (a key carrying
    * >> 1/parallelism of the rows is a single-reducer hotspot). One
    * map-side-combining count per key, a one-row total broadcast back,
    * top-k via TakeOrdered — the diagnosis never costs more than the
    * aggregation it is diagnosing.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 topK: Int = 10): DataFrame = {
    require(keyCols.nonEmpty && topK > 0, "need key columns and topK > 0")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(keyCols.map(col) ++ Seq(col("n"),
        (col("n") / col("_total")).as("share")): _*)
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
  }
}
