package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as typed mapPartitions batches (the Scala analog of mapInPandas —
  * per-partition batch processing with an arbitrary native library inside).
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment): [[FakeDecoder]] is a deterministic byte-level stand-in with
  * the same signature a real decoder would have (bytes -> features). The
  * Spark-side plumbing — schema, binary encoding, partition-batch shape,
  * column pruning behavior — is real and oracle-checked.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int, last_byte: Int)

  /** Attach a binary payload + metadata struct to a document frame. Here the
    * payload is the utf-8 encoding of the text (a deterministic stand-in for
    * image bytes); a real pipeline reads the bytes from parquet/blob store. */
  def attachBinary(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("n_chars"), col("lang"), lit("image/fake").as("mime")).as("meta"))

  /** STUB decoder — stands in for e.g. JPEG decode + feature extraction.
    * Deterministic byte-level features so the plumbing is testable without
    * media libraries; swap the body for the real library call in
    * production. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val first = if (n > 0) payload(0) & 0xFF else -1
      val last = if (n > 0) payload(n - 1) & 0xFF else -1
      (n, first, last)
    }
  }

  /** Feature extraction over binary payloads via typed mapPartitions: the
    * decoder is invoked per row but amortizes any per-partition setup (model
    * load, codec init) across the batch — the same execution shape a real
    * media pipeline needs. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media
      .select(col("doc_id").cast("long"), col("payload"),
        col("meta.mime").as("media_type"))
      .as[MediaRow]
    ds.mapPartitions { rows =>
      // per-partition decoder setup would happen here (once per batch)
      rows.map { r =>
        val (n, first, last) = FakeDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, n, first, last)
      }
    }.toDF()
  }

  /** Frame sampling over "video" payloads: every `stride`-th frame of a
    * binary payload becomes its own row (frame_no, byte offset, fixed-size
    * frame slice). Frame geometry comes from METADATA (`frame_bytes`), not
    * from decoding — the explode is a pure column expression
    * (`sequence` + `substring` on binary), so Spark prunes, pushes, and
    * whole-stage-compiles it; only a downstream decoder (stubbed here, see
    * [[FakeDecoder]]) would touch the actual bytes.
    *
    * This is the row-explosion half of a video pipeline: output rows =
    * ceil(n_frames/stride) per document, each independently processable
    * (shuffle/repartition by (doc_id, frame_no) spreads one long video
    * across executors — the skew story for hour-long payloads). Ragged
    * tails (payload not a multiple of frame_bytes) keep the partial last
    * frame. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, s"frameBytes/stride must be > 0")
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("long")
    media
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(when(col("n_frames") > 0,
            sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<long>"))).as("frame_no"))
      .select(col("doc_id"), col("frame_no"),
        (col("frame_no") * frameBytes).as("byte_offset"),
        // Substring over BinaryType slices bytes; 1-based start
        col("payload").substr((col("frame_no") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame_bytes"))
  }
}
