package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as typed mapPartitions batches (the Scala analog of mapInPandas —
  * per-partition batch processing with an arbitrary native library inside).
  *
  * [[MediaDecoder]] is a real pure-JVM header decoder for two public
  * formats — BMP (BITMAPINFOHEADER family) and WAV (RIFF/WAVE) — with a
  * byte-level fallback for anything else. Compressed codecs (JPEG/MP3/
  * H.264) need native libraries this environment doesn't ship; they would
  * slot into the same `decode` entry point without touching the Spark-side
  * plumbing (schema, binary encoding, partition-batch shape), which is real
  * and oracle-checked either way.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Decoded features: byte-level fields are always filled; image fields
    * (width/height/bit_depth) only for format="bmp", audio fields
    * (channels/sample_rate/n_samples) only for format="wav" — None maps to
    * a null column. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int,
                           last_byte: Int, format: String,
                           width: Option[Int], height: Option[Int],
                           bit_depth: Option[Int], channels: Option[Int],
                           sample_rate: Option[Int], n_samples: Option[Long])

  /** Attach a binary payload + metadata struct to a document frame. Here the
    * payload is the utf-8 encoding of the text (a deterministic stand-in for
    * image bytes); a real pipeline reads the bytes from parquet/blob store. */
  def attachBinary(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("n_chars"), col("lang"), lit("image/fake").as("mime")).as("meta"))

  /** Pure-JVM media header decoder. Never throws on malformed bytes — a
    * corrupt payload in a billion must degrade to the byte-level fallback,
    * not kill the job. Formats are detected from magic bytes and validated
    * strictly (header size whitelist, sane dimensions, plane/bpp checks) so
    * arbitrary binary that merely starts with 'B','M' stays "raw". Format
    * references are the public specs: Windows BITMAPFILEHEADER/
    * BITMAPINFOHEADER layout and the RIFF/WAVE chunk structure. */
  object MediaDecoder {
    private def u16le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def u32le(b: Array[Byte], i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    private def i32le(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
        ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private val DibSizes = Set(40L, 52L, 56L, 108L, 124L) // BITMAPINFOHEADER+
    private val BmpBpp = Set(1, 4, 8, 16, 24, 32)
    private val MaxDim = 1 << 24

    /** (width, height, bit_depth) from a BMP BITMAPINFOHEADER-family file;
      * negative height (top-down rows) reports as absolute. */
    def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
      if (b.length < 30 || b(0) != 'B' || b(1) != 'M') return None
      if (!DibSizes(u32le(b, 14))) return None
      val w = i32le(b, 18); val h = i32le(b, 22)
      val planes = u16le(b, 26); val bpp = u16le(b, 28)
      if (planes != 1 || w <= 0 || w > MaxDim || h == 0 ||
        math.abs(h) > MaxDim || !BmpBpp(bpp)) None
      else Some((w, math.abs(h), bpp))
    }

    /** (channels, sample_rate, bit_depth, n_samples) from a RIFF/WAVE file:
      * walks the chunk list (chunks pad to even offsets) for "fmt " and
      * "data"; n_samples = data bytes / block align. */
    def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
      var dataBytes = -1L
      while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
        val id = tag(b, i); val size = u32le(b, i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
          val channels = u16le(b, i + 10)
          val rate = u32le(b, i + 12)
          val blockAlign = u16le(b, i + 20)
          val bits = u16le(b, i + 22)
          if (channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0)
            fmt = Some((channels, rate.toInt, bits, blockAlign))
        } else if (id == "data") {
          // the declared size may overrun a truncated payload: clamp
          dataBytes = math.min(size, (b.length - i - 8).toLong)
        }
        val advance = 8L + size + (size & 1L) // chunks pad to even
        if (advance <= 0 || i + advance > Int.MaxValue) return None
        i += advance.toInt
      }
      fmt.flatMap { case (channels, rate, bits, blockAlign) =>
        if (dataBytes < 0 || blockAlign <= 0) None
        else Some((channels, rate, bits, dataBytes / blockAlign))
      }
    }

    /** Nearest-neighbor downsample of an uncompressed 24-bpp BMP by an
      * integer factor: output pixel (x, y) copies source pixel
      * (x·factor, y·factor) in LOGICAL (top-down image) coordinates,
      * handling both bottom-up and top-down source row orders; the output
      * re-encodes as a standard bottom-up 24-bpp BMP with 4-byte row
      * padding. Returns None for anything that isn't a valid uncompressed
      * 24-bpp BMP (the caller keeps such rows out of the resized set
      * rather than guessing). Pure JVM byte arithmetic — the per-partition
      * batch shape is the operator's concern, not this function's. */
    def downsampleBmp24(b: Array[Byte], factor: Int): Option[Array[Byte]] = {
      require(factor >= 1, s"factor must be >= 1: $factor")
      decodeBmp(b).flatMap { case (w, h, bpp) =>
        val compression = if (b.length >= 34) u32le(b, 30) else -1L
        val pixOff = u32le(b, 10)
        val rowBytes = (w * 3 + 3) / 4 * 4
        val topDown = i32le(b, 22) < 0
        if (bpp != 24 || compression != 0L ||
          pixOff + rowBytes.toLong * h > b.length) None
        else {
          val wOut = (w + factor - 1) / factor
          val hOut = (h + factor - 1) / factor
          val rowOut = (wOut * 3 + 3) / 4 * 4
          val out = java.nio.ByteBuffer.allocate(14 + 40 + rowOut * hOut)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out.put('B'.toByte).put('M'.toByte).putInt(14 + 40 + rowOut * hOut)
            .putShort(0).putShort(0).putInt(14 + 40)
          out.putInt(40).putInt(wOut).putInt(hOut).putShort(1).putShort(24)
            .putInt(0).putInt(rowOut * hOut).putInt(2835).putInt(2835)
            .putInt(0).putInt(0)
          val arr = out.array()
          var y = 0
          while (y < hOut) {
            val sy = y * factor // logical row
            val srcRow = if (topDown) sy else h - 1 - sy
            val dstRow = hOut - 1 - y // bottom-up output
            var x = 0
            while (x < wOut) {
              val src = (pixOff + srcRow.toLong * rowBytes).toInt + x * factor * 3
              val dst = 14 + 40 + dstRow * rowOut + x * 3
              arr(dst) = b(src); arr(dst + 1) = b(src + 1)
              arr(dst + 2) = b(src + 2)
              x += 1
            }
            y += 1
          }
          Some(arr)
        }
      }
    }

    /** Full decode: byte-level features always, plus the format-specific
      * header fields when the payload is a valid BMP or WAV. */
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val first = if (n > 0) payload(0) & 0xFF else -1
      val last = if (n > 0) payload(n - 1) & 0xFF else -1
      decodeBmp(payload) match {
        case Some((w, h, bpp)) =>
          MediaFeatures(docId, n, first, last, "bmp",
            Some(w), Some(h), Some(bpp), None, None, None)
        case None => decodeWav(payload) match {
          case Some((channels, rate, bits, samples)) =>
            MediaFeatures(docId, n, first, last, "wav",
              None, None, Some(bits), Some(channels), Some(rate), Some(samples))
          case None =>
            MediaFeatures(docId, n, first, last, "raw",
              None, None, None, None, None, None)
        }
      }
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
      rows.map(r => MediaDecoder.decode(r.doc_id, r.payload))
    }.toDF()
  }

  case class ResizedImage(doc_id: Long, w_in: Int, h_in: Int, w_out: Int,
                          h_out: Int, n_bytes_out: Int, sum_b: Long,
                          sum_g: Long, sum_r: Long, payload: Array[Byte])

  /** Image resize over binary payloads — the downsample step of a
    * multimodal ingest (thumbnail/feature-input normalization), as a
    * typed mapPartitions batch like [[extractFeatures]]: per-partition
    * setup amortizes across rows, rows flow one at a time (no
    * per-partition materialization), and the output is again an opaque
    * binary column + typed stats, so the downstream plumbing
    * (partitioning, writes, further decode stages) is ordinary Spark.
    * Non-BMP / compressed payloads are dropped from the resized set —
    * resizing what you can't decode is a silent-corruption bug, not a
    * fallback (callers left-join the output back if they need the
    * original rows). Channel sums over the OUTPUT pixels are exact
    * integers — the deterministic check a spec (or a downstream monitor)
    * compares against a reference loop. */
  def resizeImages(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resizeImages: factor must be >= 1: $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"),
        lit("image/bmp").as("media_type")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          for {
            (w, h, _) <- MediaDecoder.decodeBmp(r.payload)
            out <- MediaDecoder.downsampleBmp24(r.payload, factor)
            (wo, ho, _) <- MediaDecoder.decodeBmp(out)
          } yield {
            val rowOut = (wo * 3 + 3) / 4 * 4
            var (sb, sg, sr) = (0L, 0L, 0L)
            var y = 0
            while (y < ho) {
              var x = 0
              while (x < wo) {
                val off = 14 + 40 + y * rowOut + x * 3
                sb += out(off) & 0xFF; sg += out(off + 1) & 0xFF
                sr += out(off + 2) & 0xFF
                x += 1
              }
              y += 1
            }
            ResizedImage(r.doc_id, w, h, wo, ho, out.length, sb, sg, sr, out)
          }
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
