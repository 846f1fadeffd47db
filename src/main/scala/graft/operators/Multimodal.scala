package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run as typed mapPartitions batches (the Scala analog of mapInPandas —
  * per-partition batch processing with an arbitrary native library inside).
  *
  * [[MediaDecoder]] decodes three image formats and one audio format with
  * no native libraries: BMP (BITMAPINFOHEADER family) and WAV (RIFF/WAVE)
  * via pure-JVM header/byte readers, and JPEG/PNG via `javax.imageio` —
  * the JDK's own headless, pure-Java codecs (magic-byte routed, so
  * arbitrary binary never reaches a codec). Everything else degrades to a
  * byte-level `raw` fallback that never throws. Video codecs (H.264 etc.)
  * would slot into the same `decode` entry point; the Spark-side plumbing
  * (schema, binary encoding, partition-batch shape) is real and
  * oracle-checked either way.
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

    /** The ONE RIFF chunk walk, shared by [[decodeWav]] and
      * [[wavSamples16]] (two divergent copies would drift on
      * malformed-size handling): locates the first structurally-complete
      * "fmt " chunk and the "data" chunk — chunks pad to even offsets,
      * declared sizes clamp to a truncated payload, a non-advancing or
      * overflowing size aborts the whole walk (never loops, never
      * throws). Returns (fmt payload offset, data offset, data length),
      * -1 each when missing/aborted. */
    private def walkRiff(b: Array[Byte]): (Int, Int, Int) = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        return (-1, -1, -1)
      var i = 12
      var fmtOff = -1; var dataOff = -1; var dataLen = -1
      while (i + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
        val id = tag(b, i); val size = u32le(b, i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length &&
          fmtOff < 0) fmtOff = i + 8
        else if (id == "data" && dataOff < 0) {
          dataOff = i + 8
          // the declared size may overrun a truncated payload: clamp
          dataLen = math.min(size, (b.length - i - 8).toLong).toInt
        }
        val advance = 8L + size + (size & 1L) // chunks pad to even
        if (advance <= 0 || i + advance > Int.MaxValue) return (-1, -1, -1)
        i += advance.toInt
      }
      (fmtOff, dataOff, dataLen)
    }

    /** (channels, sample_rate, bit_depth, n_samples) from a RIFF/WAVE file
      * via [[walkRiff]]; n_samples = data bytes / block align. */
    def decodeWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      val (fmtOff, dataOff, dataLen) = walkRiff(b)
      if (fmtOff < 0 || dataOff < 0 || dataLen < 0) None
      else {
        val channels = u16le(b, fmtOff + 2)
        val rate = u32le(b, fmtOff + 4)
        val blockAlign = u16le(b, fmtOff + 12)
        val bits = u16le(b, fmtOff + 14)
        if (channels > 0 && rate > 0 && rate <= Int.MaxValue && bits > 0 &&
          blockAlign > 0)
          Some((channels, rate.toInt, bits, dataLen.toLong / blockAlign))
        else None
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

    /** Magic-byte sniff for the two compressed formats `javax.imageio`
      * decodes pure-JVM and headless (no native libs, no display). */
    private def looksJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
        (b(2) & 0xFF) == 0xFF
    private def looksPng(b: Array[Byte]): Boolean =
      b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A &&
        (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A

    /** Decoded images above this pixel count are treated as undecodable:
      * half a gigapixel is far past any legitimate thumbnail/feature
      * input, so the cap costs nothing real. NOTE the pixel cap alone
      * does NOT bound the BMP re-encode size — row padding makes
      * rowBytes·h pad-dominated for degenerate narrow-tall shapes (w=1,
      * h=2²⁹ passes the pixel cap yet 4·2²⁹ wraps an Int) — so
      * [[decodeImageIo]] also gates on [[bmp24Bytes]], the EXACT output
      * size [[toBmp24]] will allocate. */
    private val MaxImagePixels = 1L << 29

    /** Exact byte size of [[toBmp24]]'s output for a w×h image, in Long
      * arithmetic (54-byte header + 4-byte-padded 24-bpp rows).
      * Package-visible so the spec can pin the gate arithmetic without
      * decoding a gigapixel fixture. */
    private[graft] def bmp24Bytes(w: Long, h: Long): Long =
      54L + (w * 3 + 3) / 4 * 4 * h

    // ImageIO's default InputStream path spools through a TEMP FILE
    // (FileCacheImageInputStream) — per-row disk I/O on the executor hot
    // path. Disable once per JVM; decode then stays in memory.
    private lazy val imageIoNoCache: Unit =
      try javax.imageio.ImageIO.setUseCache(false)
      catch { case _: Throwable => () }

    /** JPEG/PNG decode via the JDK's ImageIO — routed by magic bytes so a
      * codec never sees arbitrary binary, and wrapped so a truncated or
      * corrupt payload degrades to None (the MediaDecoder never-throw
      * contract), not a job failure. Images past [[MaxImagePixels]] also
      * return None — the downstream BMP bridge cannot represent them, and
      * "dropped, not guessed at" is the contract. Returns (format, image). */
    def decodeImageIo(b: Array[Byte])
        : Option[(String, java.awt.image.BufferedImage)] = {
      val fmt = if (looksJpeg(b)) "jpeg" else if (looksPng(b)) "png" else null
      if (fmt == null) None
      else try {
        imageIoNoCache
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
          .filter { img =>
            val w = img.getWidth.toLong; val h = img.getHeight.toLong
            // both gates: pixel budget AND the re-encode's actual
            // allocation — every toBmp24 call site feeds from here, so
            // this is the single never-throw choke point
            w * h <= MaxImagePixels && bmp24Bytes(w, h) <= Int.MaxValue
          }
          .map(img => (fmt, img))
      } catch { case _: Throwable => None }
    }

    /** Re-encode any decoded image as a standard bottom-up 24-bpp BMP —
      * the bridge that lets JPEG/PNG payloads ride the same downstream
      * pixel ops ([[downsampleBmp24]], [[aHash60]]) the uncompressed path
      * uses. Row padding to 4 bytes, BGR byte order per the format. */
    def toBmp24(img: java.awt.image.BufferedImage): Array[Byte] = {
      val w = img.getWidth; val h = img.getHeight
      val rowBytes = (w * 3 + 3) / 4 * 4
      val out = java.nio.ByteBuffer.allocate(14 + 40 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(14 + 40 + rowBytes * h)
        .putShort(0).putShort(0).putInt(14 + 40)
      out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      val arr = out.array()
      var y = 0
      while (y < h) {
        val dstRow = h - 1 - y // bottom-up
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val off = 14 + 40 + dstRow * rowBytes + x * 3
          arr(off) = (rgb & 0xFF).toByte             // B
          arr(off + 1) = ((rgb >> 8) & 0xFF).toByte  // G
          arr(off + 2) = ((rgb >> 16) & 0xFF).toByte // R
          x += 1
        }
        y += 1
      }
      arr
    }

    /** (width, height, luma accessor) over LOGICAL top-down coordinates of
      * an uncompressed 24-bpp BMP; luma is the exact integer
      * (299·R + 587·G + 114·B) div 1000 — no fp anywhere, so any engine
      * replays it bit-for-bit. None for anything that isn't a valid
      * uncompressed 24-bpp BMP. */
    private def bmp24Luma(b: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] =
      decodeBmp(b).flatMap { case (w, h, bpp) =>
        val compression = if (b.length >= 34) u32le(b, 30) else -1L
        val pixOff = u32le(b, 10)
        val rowBytes = (w * 3 + 3) / 4 * 4
        val topDown = i32le(b, 22) < 0
        if (bpp != 24 || compression != 0L ||
          pixOff + rowBytes.toLong * h > b.length) None
        else Some((w, h, (x: Int, y: Int) => {
          val srcRow = if (topDown) y else h - 1 - y
          val off = (pixOff + srcRow.toLong * rowBytes).toInt + x * 3
          val bl = b(off) & 0xFF; val gr = b(off + 1) & 0xFF
          val rd = b(off + 2) & 0xFF
          (299 * rd + 587 * gr + 114 * bl) / 1000
        }))
      }

    /** 60-bit average hash (aHash) of an image payload — the perceptual
      * fingerprint behind image near-dup mining: 8×8 grid of mean lumas,
      * each bit = "this cell is brighter than the image average". 60 bits
      * (cells 0..59 in row-major order, the last 4 spare) instead of the
      * classic 64 for the same reason [[DedupOps.simhash60]] is 60-bit:
      * the value stays clear of the sign bit, every engine (and the
      * DuckDB oracle) can rebuild it in plain BIGINT arithmetic, and the
      * d04 pigeonhole chunk machinery applies unchanged
      * (hamming ≤ 3 ⇒ one equal chunk — exact recall).
      *
      * All math is exact integers: cell (bx, by) covers
      * x ∈ [bx·w/8, (bx+1)·w/8) (floor boundaries), cell mean = luma sum
      * div cell pixel count, image average = sum of the 60 cell means
      * div 60, bit = mean > avg. Accepts 24-bpp BMP directly or JPEG/PNG
      * through ImageIO → [[toBmp24]]; images smaller than 8×8 (no
      * non-empty cells) and undecodable payloads return None. */
    def aHash60(payload: Array[Byte]): Option[Long] = {
      val bmp = bmp24Luma(payload).map(Some(_)).getOrElse(
        decodeImageIo(payload).flatMap { case (_, img) =>
          bmp24Luma(toBmp24(img))
        })
      bmp.flatMap { case (w, h, luma) =>
        if (w < 8 || h < 8) None
        else {
          val means = new Array[Long](60)
          var k = 0
          while (k < 60) {
            val bx = k % 8; val by = k / 8
            val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
            val y0 = by * h / 8; val y1 = (by + 1) * h / 8
            var sum = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += luma(x, y); n += 1; x += 1 }
              y += 1
            }
            means(k) = sum / n
            k += 1
          }
          val avg = means.sum / 60
          var hash = 0L
          k = 0
          while (k < 60) {
            if (means(k) > avg) hash |= (1L << k)
            k += 1
          }
          Some(hash)
        }
      }
    }

    /** 16-bit little-endian PCM samples of a mono RIFF/WAVE payload —
      * the same [[walkRiff]] walk as [[decodeWav]], returning the raw
      * samples. None for anything that isn't valid 16-bit mono PCM. */
    def wavSamples16(b: Array[Byte]): Option[Array[Int]] = {
      val (fmtOff, dataOff, dataLen) = walkRiff(b)
      if (fmtOff < 0 || dataOff < 0 || dataLen < 0) None
      // fmt tag (offset +0) must be 1 = WAVE_FORMAT_PCM: an extensible
      // (0xFFFE) or compressed-codec header declaring 16-bit mono would
      // otherwise be misread as raw PCM — garbage samples and a bogus
      // audioSig60 polluting near-dup mining instead of a clean None
      else if (u16le(b, fmtOff) != 1 || u16le(b, fmtOff + 2) != 1 ||
        u16le(b, fmtOff + 14) != 16) None
      else {
        val n = dataLen / 2
        val out = new Array[Int](n)
        var s = 0
        while (s < n) {
          out(s) = (u16le(b, dataOff + 2 * s) << 16) >> 16 // sign-extend
          s += 1
        }
        Some(out)
      }
    }

    /** 60-bit frame-energy delta signature of a mono 16-bit WAV — the
      * audio member of the perceptual-fingerprint family (echoprint-style,
      * radically simplified to stay engine-exact): the samples split into
      * 61 frames of `frameLen`, each frame's energy is the EXACT integer
      * Σ sample² (≤ 2³¹·frameLen — no overflow for any realistic frame),
      * and bit p = energy(p+1) > energy(p) — loudness-scale-invariant
      * (energy scales cancel in the comparison) and bit-replayable by any
      * engine. 60 bits for the same BIGINT/chunk-machinery reasons as
      * [[aHash60]]. Payloads shorter than 61 frames (or non-16-bit-mono)
      * return None — dropped, not guessed at. */
    def audioSig60(payload: Array[Byte], frameLen: Int = 64): Option[Long] =
      wavSamples16(payload).flatMap { s =>
        if (s.length < 61 * frameLen) None
        else {
          val energies = Array.tabulate(61) { p =>
            var e = 0L; var i = p * frameLen
            val end = i + frameLen
            while (i < end) { e += s(i).toLong * s(i); i += 1 }
            e
          }
          var hash = 0L
          var p = 0
          while (p < 60) {
            if (energies(p + 1) > energies(p)) hash |= (1L << p)
            p += 1
          }
          Some(hash)
        }
      }

    /** Encode 16-bit mono PCM samples as a standard RIFF/WAVE payload
      * (the inverse of [[wavSamples16]]) — fixture/bridge use. */
    def toWav16(samples: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
      val dataBytes = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16)
      buf.put("data".getBytes).putInt(dataBytes)
      samples.foreach(s => buf.putShort(s.toShort))
      buf.array()
    }

    /** Full decode: byte-level features always, plus the format-specific
      * header fields when the payload is a valid BMP, JPEG, PNG, or WAV.
      * For the ImageIO formats, bit_depth is the color model's pixel
      * size. */
    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length
      val first = if (n > 0) payload(0) & 0xFF else -1
      val last = if (n > 0) payload(n - 1) & 0xFF else -1
      decodeBmp(payload) match {
        case Some((w, h, bpp)) =>
          MediaFeatures(docId, n, first, last, "bmp",
            Some(w), Some(h), Some(bpp), None, None, None)
        case None => decodeImageIo(payload) match {
          case Some((fmt, img)) =>
            MediaFeatures(docId, n, first, last, fmt,
              Some(img.getWidth), Some(img.getHeight),
              Some(img.getColorModel.getPixelSize), None, None, None)
          case None => decodeWav(payload) match {
            case Some((channels, rate, bits, samples)) =>
              MediaFeatures(docId, n, first, last, "wav",
                None, None, Some(bits), Some(channels), Some(rate),
                Some(samples))
            case None =>
              MediaFeatures(docId, n, first, last, "raw",
                None, None, None, None, None, None)
          }
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
    * JPEG/PNG payloads decode through ImageIO and ride the same
    * downsample path via [[MediaDecoder.toBmp24]]; anything UNDECODABLE
    * is dropped from the resized set — resizing what you can't decode is
    * a silent-corruption bug, not a fallback (callers left-join the
    * output back if they need the original rows). Channel sums over the
    * OUTPUT pixels are exact integers — the deterministic check a spec
    * (or a downstream monitor) compares against a reference loop. */
  def resizeImages(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resizeImages: factor must be >= 1: $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("payload"),
        lit("image/bmp").as("media_type")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val asBmp: Option[Array[Byte]] =
            if (MediaDecoder.decodeBmp(r.payload).isDefined) Some(r.payload)
            else MediaDecoder.decodeImageIo(r.payload)
              .map { case (_, img) => MediaDecoder.toBmp24(img) }
          for {
            bmp <- asBmp
            (w, h, _) <- MediaDecoder.decodeBmp(bmp)
            out <- MediaDecoder.downsampleBmp24(bmp, factor)
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

  /** Per-image 60-bit average hashes via typed mapPartitions (the
    * [[extractFeatures]] batch shape — decoder setup amortizes per
    * partition, rows stream). Undecodable / sub-8×8 payloads are dropped:
    * a perceptual hash of bytes you can't decode is noise, not signal.
    * Output (doc_id, simhash) — named for [[DedupOps.simhashPairs]],
    * which consumes it unchanged. */
  def imageHashes(media: DataFrame, idCol: org.apache.spark.sql.Column,
                  payloadCol: org.apache.spark.sql.Column): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(idCol.cast("long").as("doc_id"), payloadCol.as("payload"),
        lit("image").as("media_type")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap(r => MediaDecoder.aHash60(r.payload)
          .map(h => (r.doc_id, h)))
      }.toDF("doc_id", "simhash")
  }

  /** Perceptual image near-dup pairs — the multimodal member of the dedup
    * family (E3/E4 for pixels): aHash-60 fingerprints ([[MediaDecoder
    * .aHash60]] — resize-robust by construction: the 8×8 cell means of an
    * integer-factor downsample are means of the same pixel regions), then
    * candidates and verification ride the d04 simhash machinery verbatim —
    * single-chunk pigeonhole bands (exact recall at hamming ≤ 3; md5-
    * derived pixel fingerprints are UNIFORM, so the skew-robust
    * multi-index scheme's 5× band fan-out is pure overhead here —
    * measured 2× at sf1 — and `multiIndex = false` keeps the classic
    * 4×15 plan), bucket
    * equi-join, bit_count(xor) verify. No image×image term anywhere; the
    * only all-pairs work is within hash-equal chunk buckets, the standard
    * banding bound. Composable with [[DedupOps.dedupClusters]] /
    * [[DedupOps.canonicalPerCluster]] like any other pair miner. */
  def imageNearDupPairs(media: DataFrame, idCol: org.apache.spark.sql.Column,
                        payloadCol: org.apache.spark.sql.Column,
                        maxHamming: Int): DataFrame =
    DedupOps.simhashPairs(imageHashes(media, idCol, payloadCol), maxHamming,
      multiIndex = false)

  /** The recall audit of the image miner — `dedupRecallEval` for
    * [[imageNearDupPairs]], completing the audit family (minhash d20,
    * simhash d21, embedding sketch d22): MEASURED recall/precision of the
    * chunk-banded aHash miner against brute all-pairs hamming truth on a
    * hash-deterministic sample of the media frame. Like the simhash
    * audit, the pigeonhole makes the banded candidate set
    * provably EXHAUSTIVE at maxHamming 3, so a measured recall below
    * 1000000 flags a chunk-extraction bug and a precision below 1000000 a
    * verification regression — the audit is the tripwire, not a
    * probability estimate.
    *
    * The sample predicate is [[CurationOps.stratifiedHashSample]]'s on
    * the id alone, so only the SAMPLED payloads are ever decoded —
    * decode cost scales with the absolute audit budget, not the corpus.
    * Unlike the text audits, the fingerprint frame is NOT 1:1 with the
    * sample: undecodable / sub-8×8 payloads drop in [[imageHashes]]
    * exactly as the miner drops them, and `n_sampled` counts the
    * FINGERPRINTED images (the population the recall claim is about).
    * Output: the one-row ppm report (n_docs = media rows, n_sampled,
    * truth/banded/matched pairs, recall_ppm, precision_ppm). */
  def imageRecallEval(media: DataFrame, idCol: org.apache.spark.sql.Column,
                      payloadCol: org.apache.spark.sql.Column,
                      maxHamming: Int = 3,
                      sampleRate: Double = 0.5): DataFrame = {
    val m = media.select(idCol.as("doc_id"), payloadCol.as("payload"))
    val sample = CurationOps.stratifiedHashSample(
      m, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.lit("all"), Map.empty, sampleRate)
    // feeds the brute side twice and the banded side once — materialize
    // so decode+aHash runs once (the d03 persist lesson)
    val fp = imageHashes(sample,
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("payload"))
      .localCheckpoint(true)
    val truth = DedupOps.simhashPairsBrute(fp, maxHamming)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val banded = DedupOps.simhashPairs(fp, maxHamming, multiIndex = false)
      .select("doc_a", "doc_b")
    DedupOps.recallReport(m, fp, truth, banded)
  }

  /** Distinct (doc_id, key) frame-hash set of "video" payloads — every
    * fixed-size frame (stride 1, metadata-driven like [[sampleFrames]])
    * hashed to a 60-bit key over its hex form (blobs hex identically in
    * every engine — the m02 convention). The feeder for frame-level
    * video containment; output partitioned by key (the E93/E107
    * discipline). */
  def videoFrameKeys(media: DataFrame, idCol: org.apache.spark.sql.Column,
                     payloadCol: org.apache.spark.sql.Column,
                     frameBytes: Int): DataFrame =
    sampleFrames(media.select(idCol.as("doc_id"), payloadCol.as("payload")),
        frameBytes, stride = 1)
      .select(col("doc_id"),
        graft.functions.Hashing.hash60(hex(col("frame_bytes"))).as("key"))
      .dropDuplicates("key", "doc_id")
      .repartition(col("key"))

  /** Video near-dup via frame-hash containment — the video member of the
    * dedup family as a pure COMPOSITION of existing oracle-gated pieces:
    * [[sampleFrames]]' metadata-driven frame explode × the 60-bit hash ×
    * `DedupOps.containmentFromKeys`' inverted-index intersection. A clip
    * embedded inside a longer video has frame-set containment ~1 at any
    * offset that preserves frame alignment — the E107 asymmetric-Jaccard
    * argument, framewise. All the scale properties are inherited: one
    * exchange on the frame key, maxDf pruning of intro/outro boilerplate
    * frames, per-key fan-out ≤ maxDf². Output: (doc_a, doc_b, n_common,
    * n_keys_a, containment_ppm), ordered pairs. */
  def videoNearDupPairs(media: DataFrame, idCol: org.apache.spark.sql.Column,
                        payloadCol: org.apache.spark.sql.Column,
                        frameBytes: Int, thresholdPpm: Long,
                        maxDf: Long = Long.MaxValue): DataFrame =
    DedupOps.containmentFromKeys(
      videoFrameKeys(media, idCol, payloadCol, frameBytes), thresholdPpm,
      maxDf)

  /** Per-payload 60-bit audio signatures via typed mapPartitions — the
    * audio twin of [[imageHashes]]. Non-WAV / short / non-mono payloads
    * drop silently. Output (doc_id, simhash) for
    * [[DedupOps.simhashPairs]]. */
  def audioHashes(media: DataFrame, idCol: org.apache.spark.sql.Column,
                  payloadCol: org.apache.spark.sql.Column,
                  frameLen: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(idCol.cast("long").as("doc_id"), payloadCol.as("payload"),
        lit("audio").as("media_type")).as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap(r => MediaDecoder.audioSig60(r.payload, frameLen)
          .map(h => (r.doc_id, h)))
      }.toDF("doc_id", "simhash")
  }

  /** Audio near-dup pairs — the audio member of the dedup family:
    * frame-energy delta signatures ([[MediaDecoder.audioSig60]] —
    * loudness-invariant by construction), candidates + verification via
    * the d04 chunk machinery verbatim. Composes with clustering/canonical
    * selection like every other pair miner. */
  def audioNearDupPairs(media: DataFrame, idCol: org.apache.spark.sql.Column,
                        payloadCol: org.apache.spark.sql.Column,
                        maxHamming: Int, frameLen: Int = 64): DataFrame =
    DedupOps.simhashPairs(audioHashes(media, idCol, payloadCol, frameLen),
      maxHamming, multiIndex = false)

  /** Deterministic mono 16-bit WAV corpus derived from a document frame —
    * the audio analog of [[demoBmpCorpus]]: sample i of group
    * `doc_id div groupSize` is `hash60("aud:<group>:<i>") mod 65536 −
    * 32768` (exact md5 integers any engine replays), and variant
    * `j = doc_id mod groupSize` SILENCES frames 0..j−1 (all-zero
    * samples) — each silenced frame flips the adjacent energy-delta
    * bits, so groups are planted near-dup families. 61 frames of 64
    * samples; genuine RIFF bytes round-trip through [[MediaDecoder]]. */
  def demoWavCorpus(df: DataFrame, idCol: org.apache.spark.sql.Column,
                    groupSize: Int = 4): DataFrame =
    // the 3904 md5-derived samples depend on the GROUP only (variants
    // merely zero a prefix), so render each group's base waveform once
    // and emit the variants from it — 4× fewer md5s, bit-identical
    // payloads (the md5 stream was the dominant fixture cost at sf10:
    // 1.95e9 digests).
    renderByGroup(df, idCol, groupSize) { group =>
      val base = Array.tabulate(61 * 64)(i =>
        (graft.functions.Hashing.hash60Scalar(s"aud:$group:$i") % 65536L
          - 32768L).toInt)
      docId => {
        val j = (docId % groupSize).toInt
        val samples = Array.tabulate(61 * 64)(i =>
          if (i / 64 < j) 0 else base(i))
        MediaDecoder.toWav16(samples)
      }
    }

  /** Group-batched heavy render with a PINNED partition spread: ids
    * exchange on the group key via an explicit user repartition to
    * defaultParallelism — which AQE's coalescePartitions never shrinks,
    * unlike the byte-small groupByKey exchange this replaces (8-16 B/doc
    * of shuffle payload would coalesce to ONE partition at small scale,
    * serializing the million-md5 render downstream — the Par.scala
    * under-split trap, but past a MapGroups node Par.ensure's match set
    * can't see). Rows sort by group within each partition so `renderBase`
    * runs once per group run. */
  private def renderByGroup(df: DataFrame,
                            idCol: org.apache.spark.sql.Column,
                            groupSize: Int)
                           (renderBase: Long => Long => Array[Byte])
      : DataFrame = {
    require(groupSize >= 1, s"groupSize must be >= 1: $groupSize")
    val spark = df.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    df.select(idCol.cast("long").as("doc_id"))
      .select(col("doc_id"),
        expr(s"cast(doc_id div $groupSize as long)").as("grp"))
      .repartition(par, col("grp"))
      .sortWithinPartitions("grp", "doc_id")
      .as[(Long, Long)]
      .mapPartitions { rows =>
        var curGrp = Long.MinValue
        var render: Long => Array[Byte] = null
        rows.map { case (docId, grp) =>
          if (render == null || grp != curGrp) {
            curGrp = grp; render = renderBase(grp)
          }
          (docId, render(docId))
        }
      }.toDF("doc_id", "payload")
  }

  /** Deterministic 16×16 24-bpp BMP corpus derived from a document frame —
    * the image-side analog of [[attachBinary]]'s text stand-in, but with
    * REAL pixels: pixel (x, y) of group `doc_id div groupSize` takes its
    * BGR channels from `hash60("img:<group>:<x>:<y>")` (exact md5-derived
    * integers any engine replays), and variant `j = doc_id mod groupSize`
    * inverts the pixels of aHash cells 0..j-1 — so each group is a planted
    * near-dup family whose pairwise hash distance grows with |j_a − j_b|.
    * The payloads are genuine BMP bytes: the gate round-trips them through
    * [[MediaDecoder]]'s byte-level decode, which is the point. */
  def demoBmpCorpus(df: DataFrame, idCol: org.apache.spark.sql.Column,
                    groupSize: Int = 4): DataFrame =
    // the 256 md5-derived pixels depend on the GROUP only (variants
    // invert cells of the same base image), so hash each group's pixels
    // once and emit the variants from them — 4× fewer md5s, bit-identical
    // payloads (same move as demoWavCorpus).
    renderByGroup(df, idCol, groupSize) { group =>
      val basePx: Array[Long] = Array.tabulate(256) { p =>
        graft.functions.Hashing.hash60Scalar(s"img:$group:${p % 16}:${p / 16}")
      }
      docId => {
        val j = (docId % groupSize).toInt
        val img = new java.awt.image.BufferedImage(16, 16,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val h = basePx(y * 16 + x)
            var b = (h % 256).toInt
            var g = ((h / 256) % 256).toInt
            var r = ((h / 65536) % 256).toInt
            // cell (x/2, y/2) in row-major aHash order; invert cells < j
            if ((y / 2) * 8 + (x / 2) < j) {
              b = 255 - b; g = 255 - g; r = 255 - r
            }
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        MediaDecoder.toBmp24(img)
      }
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
