package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.multimodal.Multimodal

/** J1-J2 — multimodal binary-column plumbing (rows-only checks; the
  * batching semantics are pinned by MultimodalSpec).
  */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMediaSchema(Tables.documents(s, dir), "doc_id", "text", "n_chars")

  /** J1 `mm_schema` — binary payload + typed metadata struct. */
  def mmSchema(s: SparkSession, dir: String): DataFrame =
    media(s, dir).select(col("doc_id"),
      length(col("payload")).as("byte_len"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.format").as("format"))

  /** J2 `mm_features` — batched (stubbed) decode to feature vectors. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s, media(s, dir), batchSize = 64)
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("batch_size"),
        round(element_at(col("features"), 1), 4).as("f0"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_schema" -> mmSchema,
    "mm_features" -> mmFeatures)

  val oracles: Map[String, String] = Map()
}
