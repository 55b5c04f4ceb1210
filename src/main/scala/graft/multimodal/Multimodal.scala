package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2 J1-J2).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside. Decode / feature-extraction runs batched
  * per partition (the Scala analogue of mapInPandas' batch shape):
  * rows are pulled through an iterator in fixed-size batches so a real
  * decoder could amortize model/codec setup per batch instead of per
  * row. The actual image/audio decode is STUBBED (no codec libraries
  * in this environment) with a deterministic byte-histogram feature,
  * but the schema, batching, partitioning, and encoder plumbing are
  * real and tested.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, format: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, batch_size: Int,
                           features: Array[Float])

  /** J1: attach a binary payload + typed metadata to a text corpus
    * (payload = utf-8 bytes standing in for image bytes).
    */
  def withMediaSchema(docs: DataFrame, idCol: String, textCol: String,
                      sizeCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (col(sizeCol) % 640 + 1).cast("int").as("width"),
        (col(sizeCol) * 7 % 480 + 1).cast("int").as("height"),
        lit("png").as("format")).as("meta"))

  /** STUB decode: a real implementation would decode `payload` with an
    * image codec here, once per batch. Deterministic fake: 8-bin byte
    * histogram normalized by length.
    */
  private def decodeBatchStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val hist = new Array[Float](8)
      r.payload.foreach(b => hist((b & 0xff) >> 5) += 1f)
      val n = math.max(r.payload.length, 1)
      MediaFeatures(r.doc_id, r.payload.length, batch.size,
        hist.map(_ / n))
    }

  /** J2: batched feature extraction. Partition-parallel, with rows
    * grouped into `batchSize` chunks inside each partition — the batch
    * boundary a real decoder would amortize over.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.format").as("format"))
      .as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(decodeBatchStub))
  }

  /** J2+: attach video-container metadata (duration, fps) to a binary
    * payload — the video twin of [[withMediaSchema]].
    */
  def withVideoSchema(docs: DataFrame, idCol: String, textCol: String,
                      sizeCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (col(sizeCol) % 30000 + 1000).cast("int").as("duration_ms"),
        (col(sizeCol) % 3 * 5 + 20).cast("double").as("fps"),
        lit("mp4").as("format")).as("meta"))

  /** J2+: attach audio-container metadata (sample rate, sample count,
    * PCM format) to a binary payload — the audio twin of
    * [[withVideoSchema]] (deterministic synthetic metadata, since the
    * corpus carries no real audio).
    */
  def withAudioSchema(docs: DataFrame, idCol: String, textCol: String,
                      sizeCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        (col(sizeCol) % 3 * 8000 + 16000).cast("int").as("sample_rate"),
        (col(sizeCol) * 317 % 480000 + 16000).cast("long").as("n_samples"),
        lit("pcm_s16le").as("format")).as("meta"))

  /** J2+: fixed-length audio windowing with hop — the chunking step of
    * ASR / audio-embedding pipelines: one row per `windowMs` window
    * every `hopMs`, with the exact sample range and the byte range a
    * PCM-s16le decoder would slice (2 bytes per sample; the last
    * window clips at the clip end instead of padding). Like
    * [[sampleFrames]], the SELECTION is the real, tested part:
    * row-local sequence + explode, output bounded by n_samples/hop per
    * clip, no shuffle — the shape that turns 100 TB of audio into a
    * window table.
    */
  def sampleAudioWindows(media: DataFrame, windowMs: Int,
                         hopMs: Int): DataFrame = {
    require(windowMs > 0 && hopMs > 0, "windowMs and hopMs must be positive")
    val sr = col("meta.sample_rate").cast("long")
    val n = col("meta.n_samples")
    // floor, like the frame-index math: deterministic across engines
    val win = floor(sr * windowMs / lit(1000.0)).cast("long")
    val hop = floor(sr * hopMs / lit(1000.0)).cast("long")
    media
      .select(col("doc_id"), n.as("_n"), win.as("_win"),
        explode(sequence(lit(0L), n - 1, hop)).as("start_sample"))
      .select(col("doc_id"), col("start_sample"),
        least(col("start_sample") + col("_win"), col("_n")).as("end_sample"),
        (col("start_sample") * 2).as("byte_offset"),
        ((least(col("start_sample") + col("_win"), col("_n")) -
          col("start_sample")) * 2).as("byte_len"))
  }

  /** J2+: frame sampling — one output row per sampled frame, every
    * `everyMs` milliseconds of the clip: frame timestamp, the frame
    * index a decoder would seek to (round(ts·fps/1000)), and a
    * deterministic stand-in for the frame bytes (a payload slice; a
    * real build decodes here). The SELECTION is the real, tested part:
    * row-local sequence + explode, output bounded by duration/everyMs
    * per clip — the shape that turns 100 TB of video into a frame
    * table without any shuffle.
    */
  def sampleFrames(media: DataFrame, everyMs: Int): DataFrame = {
    val durMs = col("meta.duration_ms")
    val fps = col("meta.fps")
    val tsMs = explode(sequence(lit(0), durMs - 1, lit(everyMs))).as("frame_ts_ms")
    media.select(col("doc_id"), col("payload"), durMs.as("_dur"), fps.as("_fps"), tsMs)
      .select(col("doc_id"), col("frame_ts_ms"),
        // floor, not round: frame at-or-before the timestamp, and
        // deterministic across engines (round() differs on .5)
        floor(col("frame_ts_ms") * col("_fps") / 1000.0).cast("long").as("frame_idx"),
        // STUB decode: a byte slice stands in for the decoded frame
        substring(col("payload"), (col("frame_ts_ms") % 32 + 1).cast("int"), lit(16))
          .as("frame_bytes"))
  }
}
