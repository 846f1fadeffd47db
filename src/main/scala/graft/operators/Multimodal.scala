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
}
