package graft

import org.apache.spark.sql.functions._
import graft.operators.{EtlOps, Multimodal, RadiusDedup}

/** Unit coverage for the batch-ETL operators' edge semantics (the sf-scale
  * behavior is covered by the Verify oracle gate). */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("findColumn: normalized exact match wins over substring") {
    val cols = Seq("Part-Key", "The Name", "part_key_old")
    assert(EtlOps.findColumn(cols, Seq("partkey")) === Some("Part-Key"))
    assert(EtlOps.findColumn(cols, Seq("name")) === Some("The Name"))
    assert(EtlOps.findColumn(cols, Seq("missing", "name")) === Some("The Name"))
    assert(EtlOps.findColumn(cols, Seq("nope")) === None)
  }

  test("sniffDelimiter picks the densest candidate in the head bytes") {
    val tmp = java.nio.file.Files.createTempDirectory("sniff")
    val f = tmp.resolve("x.csv")
    java.nio.file.Files.writeString(f, "a;b;c\n1;2;3\n4;5;6\n")
    assert(EtlOps.sniffDelimiter(spark, f.toString) === ';')
    val g = tmp.resolve("y.csv")
    java.nio.file.Files.writeString(g, "a\tb\tc\n1\t2,5\t3\n")
    assert(EtlOps.sniffDelimiter(spark, g.toString) === '\t')
  }

  test("stagedFallbackJoin fills only missing rows and records the stage") {
    val left = Seq((1, 10, 10), (2, 99, 20), (3, 98, 97)).toDF("id", "k1", "k2")
    val right = Seq((10, "a"), (20, "b"), (30, "c")).toDF("rk", "v")
    val out = EtlOps.stagedFallbackJoin(left, right,
        Seq(col("k1") -> col("rk"), col("k2") -> col("rk")), Seq("v"))
      .select("id", "v", "matched_stage").orderBy("id").collect()
    assert(out(0).getString(1) === "a" && out(0).getInt(2) === 1)
    assert(out(1).getString(1) === "b" && out(1).getInt(2) === 2)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("radius dedup: greedy keep-first in id order") {
    // three points on a line ~111 km/deg apart: 0 and 1 within 200 km,
    // 2 farther; greedy keeps 0 (first), drops 1 (near 0), keeps 2
    val pts = Seq(
      ("g", 0L, 0.0, 0.0),
      ("g", 1L, 1.0, 0.0),
      ("g", 2L, 5.0, 0.0)).toDF("grp", "id", "lat", "lon")
    val kept = RadiusDedup(pts, 200.0).select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(0L, 2L))
  }

  test("b28: ordered-column CSV sink + YAML render") {
    val df = Seq((2, "b"), (1, "a")).toDF("id", "name")
    val tmp = java.nio.file.Files.createTempDirectory("sink").toString
    EtlOps.writeOrderedCsv(df.orderBy("id"), Seq("name", "id"), tmp)
    val back = spark.read.option("header", "true").csv(tmp)
    assert(back.columns.toSeq === Seq("name", "id"))
    assert(back.count() === 2)
    val yaml = EtlOps.yamlRender("hotels", 2,
      Seq(Map("id" -> "1", "name" -> "a"), Map("id" -> "2", "name" -> "b")))
    assert(yaml.startsWith("schema_version: 2\nhotels:"))
    assert(yaml.contains("  - id: 1"))
  }

  test("unpivot: pivot round-trip, nulls dropped, common type") {
    val wide = Seq((1L, 10.0, 2.5), (2L, 20.0, 3.5)).toDF("k", "a", "b")
    val long = EtlOps.unpivotLong(wide, Seq("k"), Seq("a", "b"))
      .orderBy("k", "metric").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(long.toSeq === Seq((1L, "a", 10.0), (1L, "b", 2.5),
      (2L, "a", 20.0), (2L, "b", 3.5)))
    // sparse wide row: the null cell vanishes (pivot's sparse convention)
    val sparse = Seq((1L, Some(10.0), Option.empty[Double])).toDF("k", "a", "b")
    assert(EtlOps.unpivotLong(sparse, Seq("k"), Seq("a", "b")).count() === 1)
  }

  test("jsonl permissive read: bad lines land in _corrupt with raw bytes, good lines parse") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("jsonl").toString
    Seq("""{"id":1,"name":"ok"}""", """{"id":2,"na""", """{"id":3,"name":"fine"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val out = EtlOps.readJsonlPermissive(spark, tmp, schema)
    val good = out.filter(col("_corrupt").isNull).orderBy("id").collect()
    assert(good.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val bad = out.filter(col("_corrupt").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getAs[String]("_corrupt").startsWith("""{"id":2"""))
  }

  test("multimodal: binary plumbing + byte-level decode features") {
    val docs = Seq((7L, "abc", "en", "s", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.extractFeatures(Multimodal.attachBinary(docs)).collect()
    assert(out.head.getLong(0) === 7L)
    assert(out.head.getInt(1) === 3) // n_bytes
    assert(out.head.getInt(2) === 'a'.toInt)
    assert(out.head.getInt(3) === 'c'.toInt)
    assert(out.head.getString(4) === "raw") // text bytes are no known format
  }

  /** A real 3x2 24-bpp BMP: 14-byte file header + 40-byte BITMAPINFOHEADER
    * + 2 rows of 3 BGR pixels padded to 12 bytes each. */
  private def bmpFixture(width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    val pixelBytes = rowBytes * height
    val fileSize = 14 + 40 + pixelBytes
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(14 + 40) // reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    (0 until pixelBytes).foreach(i => buf.put((i % 251).toByte))
    buf.array()
  }

  /** A real 16-bit mono 8 kHz RIFF/WAVE file with `nSamples` samples, plus
    * a LIST chunk before fmt to prove the chunk walk skips unknown ids. */
  private def wavFixture(nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val listBody = 5 // odd size: the walker must pad to even
    val size = 4 + (8 + listBody + 1) + (8 + 16) + (8 + dataBytes)
    val buf = java.nio.ByteBuffer.allocate(8 + size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(size).put("WAVE".getBytes)
    buf.put("LIST".getBytes).putInt(listBody).put(new Array[Byte](listBody + 1))
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000) // PCM, mono, rate, byte rate
      .putShort(2).putShort(16) // block align, bits
    buf.put("data".getBytes).putInt(dataBytes)
    (0 until nSamples).foreach(i => buf.putShort((i * 1000).toShort))
    buf.array()
  }

  test("multimodal: real BMP and WAV fixture bytes decode through the header parser") {
    val media = Seq(
      (1L, bmpFixture(3, 2), "image/bmp"),
      (2L, wavFixture(4), "audio/wav"),
      (3L, "BMnot really a bitmap, just text".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"), col("payload"),
        struct(lit(0L).as("n_chars"), lit("xx").as("lang"), col("mime")).as("meta"))
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val bmp = out(0)
    assert(bmp.getString(4) === "bmp")
    assert(bmp.getInt(bmp.fieldIndex("width")) === 3)
    assert(bmp.getInt(bmp.fieldIndex("height")) === 2)
    assert(bmp.getInt(bmp.fieldIndex("bit_depth")) === 24)
    assert(bmp.isNullAt(bmp.fieldIndex("sample_rate")))
    val wav = out(1)
    assert(wav.getString(4) === "wav")
    assert(wav.getInt(wav.fieldIndex("channels")) === 1)
    assert(wav.getInt(wav.fieldIndex("sample_rate")) === 8000)
    assert(wav.getInt(wav.fieldIndex("bit_depth")) === 16)
    assert(wav.getLong(wav.fieldIndex("n_samples")) === 4L)
    assert(wav.isNullAt(wav.fieldIndex("width")))
    // 'BM'-prefixed text fails the DIB-size whitelist -> raw, not a crash
    val txt = out(2)
    assert(txt.getString(4) === "raw")
    assert(txt.isNullAt(txt.fieldIndex("width")))
  }

  test("multimodal: truncated/corrupt headers degrade to raw, never throw") {
    val cases = Seq[(Long, Array[Byte])](
      (1L, Array[Byte]()), // empty
      (2L, bmpFixture(3, 2).take(20)), // truncated BMP
      (3L, wavFixture(4).take(30)), // truncated WAV (fmt cut)
      (4L, "RIFFxxxxWAVE".getBytes("UTF-8"))) // WAVE magic, no chunks
    val media = cases.toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0L).as("n_chars"), lit("xx").as("lang"),
          lit("application/octet-stream").as("mime")).as("meta"))
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    assert(out.forall(_.getString(4) === "raw"))
    assert(out.head.getInt(1) === 0 && out.head.getInt(2) === -1)
  }

  test("multimodal: BMP nearest-neighbor downsample matches the reference loop") {
    import spark.implicits._
    val src = bmpFixture(5, 4) // deterministic i%251 pixel pattern
    // reference: logical pixel (x, y) of a bottom-up 24-bpp BMP
    def pix(b: Array[Byte], w: Int, h: Int, x: Int, y: Int): (Int, Int, Int) = {
      val rowBytes = (w * 3 + 3) / 4 * 4
      val off = 54 + (h - 1 - y) * rowBytes + x * 3
      ((b(off) & 0xFF), (b(off + 1) & 0xFF), (b(off + 2) & 0xFF))
    }
    val media = Seq((1L, src), (2L, "not a bitmap".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(media, factor = 2)
      .orderBy("doc_id").collect()
    assert(out.length === 1) // the non-BMP row is dropped, not guessed at
    val r = out(0)
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) === (5, 4, 3, 2))
    val resized = r.getAs[Array[Byte]]("payload")
    assert(graft.operators.Multimodal.MediaDecoder.decodeBmp(resized)
      === Some((3, 2, 24)))
    // every output pixel equals source pixel (x*2, y*2); sums agree
    var (sb, sg, sr) = (0L, 0L, 0L)
    for (y <- 0 until 2; x <- 0 until 3) {
      val want = pix(src, 5, 4, x * 2, y * 2)
      val got = pix(resized, 3, 2, x, y)
      assert(got === want, s"pixel ($x,$y)")
      sb += want._1; sg += want._2; sr += want._3
    }
    assert((r.getLong(6), r.getLong(7), r.getLong(8)) === (sb, sg, sr))
    // factor 1: identity on dims and channel sums
    val id = Multimodal.resizeImages(media, factor = 1)
      .orderBy("doc_id").collect()(0)
    assert((id.getInt(3), id.getInt(4)) === (5, 4))
    val idSums = (id.getLong(6), id.getLong(7), id.getLong(8))
    val srcSums = {
      var (b2, g2, r2) = (0L, 0L, 0L)
      for (y <- 0 until 4; x <- 0 until 5) {
        val p = pix(src, 5, 4, x, y); b2 += p._1; g2 += p._2; r2 += p._3
      }
      (b2, g2, r2)
    }
    assert(idSums === srcSums)
  }

  /** Deterministic RGB test image for the ImageIO paths. */
  private def testImage(w: Int, h: Int,
                        rgb: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    img
  }

  private def encodeImage(img: java.awt.image.BufferedImage,
                          fmt: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  test("multimodal: JPEG and PNG decode through ImageIO; truncated falls to raw") {
    val noise = (x: Int, y: Int) =>
      (((x * 37 + y * 11) % 256) << 16) | (((x * 5 + y * 91) % 256) << 8) |
        ((x * 71 + y * 3) % 256)
    val jpeg = encodeImage(testImage(16, 12, noise), "jpg")
    val png = encodeImage(testImage(10, 7, noise), "png")
    val media = Seq((1L, jpeg), (2L, png), (3L, jpeg.take(50)))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit(0L).as("n_chars"), lit("xx").as("lang"),
          lit("image/*").as("mime")).as("meta"))
    val out = Multimodal.extractFeatures(media).orderBy("doc_id").collect()
    val j = out(0)
    assert(j.getString(4) === "jpeg")
    assert(j.getInt(j.fieldIndex("width")) === 16)
    assert(j.getInt(j.fieldIndex("height")) === 12)
    assert(j.getInt(j.fieldIndex("bit_depth")) === 24)
    val p = out(1)
    assert(p.getString(4) === "png")
    assert(p.getInt(p.fieldIndex("width")) === 10)
    assert(p.getInt(p.fieldIndex("height")) === 7)
    // a truncated JPEG must degrade to raw byte features, never throw
    assert(out(2).getString(4) === "raw")
  }

  test("multimodal: PNG resizes losslessly through the BMP bridge; bad JPEG drops") {
    import spark.implicits._
    val noise = (x: Int, y: Int) =>
      (((x * 37 + y * 11) % 256) << 16) | (((x * 5 + y * 91) % 256) << 8) |
        ((x * 71 + y * 3) % 256)
    val img = testImage(8, 6, noise)
    val png = encodeImage(img, "png")
    val jpeg = encodeImage(testImage(8, 6, noise), "jpg")
    val media = Seq((1L, png), (2L, jpeg.take(60)), (3L, jpeg))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(media, factor = 2)
      .orderBy("doc_id").collect()
    // truncated JPEG dropped; PNG and whole JPEG resized
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val r = out(0)
    assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)) === (8, 6, 4, 3))
    // PNG is lossless: output pixel (x, y) == source pixel (2x, 2y) exactly
    var (sb, sg, sr) = (0L, 0L, 0L)
    for (y <- 0 until 3; x <- 0 until 4) {
      val rgb = img.getRGB(x * 2, y * 2)
      sb += rgb & 0xFF; sg += (rgb >> 8) & 0xFF; sr += (rgb >> 16) & 0xFF
    }
    assert((r.getLong(6), r.getLong(7), r.getLong(8)) === (sb, sg, sr))
    assert(Multimodal.MediaDecoder.decodeBmp(r.getAs[Array[Byte]]("payload"))
      === Some((4, 3, 24)))
  }

  test("imageNearDupPairs: planted variant groups pair; cross-group never") {
    import spark.implicits._
    val docs = (0L until 12L).toDF("doc_id") // 3 groups of 4 variants
    val corpus = Multimodal.demoBmpCorpus(docs, col("doc_id"))
    val pairs = Multimodal.imageNearDupPairs(corpus, col("doc_id"),
        col("payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    // every surviving pair is within a planted group
    assert(pairs.forall { case (a, b, _) => a / 4 == b / 4 },
      s"cross-group pair leaked: ${pairs.mkString(",")}")
    // adjacent variants (one extra inverted cell) are the closest pairs:
    // every group must pair at least its j=0/j=1 members
    for (g <- 0L until 3L)
      assert(pairs.exists { case (a, b, _) => a == g * 4 && b == g * 4 + 1 },
        s"group $g lost its adjacent-variant pair")
    // hamming is genuine bit distance, bounded by the planted cell flips
    assert(pairs.forall(_._3 <= 3))
  }

  test("imageRecallEval: pigeonhole-exact ppms; undecodable payloads shrink n_sampled only") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id") // 10 planted groups of 4
    val corpus = Multimodal.demoBmpCorpus(docs, col("doc_id"))
    // an undecodable payload must never crash the audit; it simply drops
    // from the fingerprinted population (n_sampled), like in the miner
    val junk = Seq((1000L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val r = Multimodal.imageRecallEval(corpus.unionByName(junk),
      col("doc_id"), col("payload"), maxHamming = 3, sampleRate = 1.0)
      .collect().head
    assert(r.getAs[Long]("n_docs") === 41L)
    assert(r.getAs[Long]("n_sampled") === 40L)
    assert(r.getAs[Long]("truth_pairs") > 0L) // adjacent variants pair
    assert(r.getAs[Long]("banded_pairs") === r.getAs[Long]("truth_pairs"))
    assert(r.getAs[Long]("matched_pairs") === r.getAs[Long]("truth_pairs"))
    assert(r.getAs[Long]("recall_ppm") === 1000000L)
    assert(r.getAs[Long]("precision_ppm") === 1000000L)
    // the truth side really is the brute miner: same pair count as m03's
    // full-corpus pair set at rate 1.0
    val m03Pairs = Multimodal.imageNearDupPairs(corpus, col("doc_id"),
      col("payload"), maxHamming = 3).count()
    assert(r.getAs[Long]("truth_pairs") === m03Pairs)
  }

  test("image pairs compose with dedupClusters + canonicalPerCluster like any miner") {
    import spark.implicits._
    import graft.operators.DedupOps
    val docs = (0L until 8L).toDF("doc_id") // 2 planted groups of 4
    val corpus = Multimodal.demoBmpCorpus(docs, col("doc_id"))
    val pairs = Multimodal.imageNearDupPairs(corpus, col("doc_id"),
      col("payload"), maxHamming = 3)
    val clusters = DedupOps.dedupClusters(docs.select(col("doc_id")),
      pairs.select(col("doc_a"), col("doc_b")))
    val rep = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // paired docs share a rep; the two groups never merge
    pairs.collect().foreach(p =>
      assert(rep(p.getLong(0)) === rep(p.getLong(1))))
    assert((0L until 4L).map(rep).toSet.intersect(
      (4L until 8L).map(rep).toSet).isEmpty, s"groups merged: $rep")
    // canonical selection: highest integer score wins within each cluster
    val scores = docs.select(col("doc_id"), (col("doc_id") * 10L).as("score"))
    val keep = DedupOps.canonicalPerCluster(clusters, scores,
        col("doc_id"), col("score"))
      .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
    // one keeper per cluster, and it's that cluster's max-score member
    val byRep = rep.groupBy(_._2).view.mapValues(_.keys.max).toMap
    assert(keep === byRep.values.toSet, s"keepers $keep vs $byRep")
  }

  test("MediaSource: a directory of real media files flows into the decode pipeline") {
    import graft.sources.MediaSource
    val dir = java.nio.file.Files.createTempDirectory("media_src").toFile
    try {
      val bmp = Multimodal.MediaDecoder.toBmp24(testImage(6, 5,
        (x, y) => (x * 40 << 16) | (y * 50 << 8) | 128))
      val wav = Multimodal.MediaDecoder.toWav16(Array.tabulate(100)(_ * 300))
      java.nio.file.Files.write(new java.io.File(dir, "a.bmp").toPath, bmp)
      java.nio.file.Files.write(new java.io.File(dir, "b.wav").toPath, wav)
      java.nio.file.Files.write(new java.io.File(dir, "junk.bin").toPath,
        "BMnot really".getBytes)
      // glob pushes the format filter into the LISTING
      val onlyBmp = MediaSource.readBinaryDir(spark, dir.getPath,
        glob = Some("*.bmp"))
      assert(onlyBmp.count() === 1L)
      // the full read decodes by magic bytes, junk degrades to raw
      val all = MediaSource.readBinaryDir(spark, dir.getPath)
        .select(col("doc_id"), col("path"), col("payload"),
          struct(lit(0L).as("n_chars"), lit("xx").as("lang"),
            lit("application/octet-stream").as("mime")).as("meta"))
      val feats = Multimodal.extractFeatures(all)
        .collect().map(r => r.getString(4)).sorted
      assert(feats.toSeq === Seq("bmp", "raw", "wav"))
      // doc_id is a pure function of the path: a second listing agrees
      val ids1 = MediaSource.readBinaryDir(spark, dir.getPath)
        .select("path", "doc_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ids2 = MediaSource.readBinaryDir(spark, dir.getPath)
        .select("path", "doc_id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(ids1 === ids2 && ids1.size === 3)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("aHash60/imageHashes edge cases: empty, sub-8x8, corrupt rows drop silently") {
    import spark.implicits._
    import Multimodal.MediaDecoder
    assert(MediaDecoder.aHash60(Array.emptyByteArray).isEmpty)
    assert(MediaDecoder.aHash60("not an image at all".getBytes).isEmpty)
    // a real 4x4 BMP decodes but has no non-empty 8x8 cells -> None
    val tiny = MediaDecoder.toBmp24(new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB))
    assert(MediaDecoder.aHash60(tiny).isEmpty)
    // mixed frame: only the decodable, hashable row survives
    val good = Multimodal.demoBmpCorpus(Seq(7L).toDF("doc_id"), col("doc_id"))
      .collect()(0).getAs[Array[Byte]]("payload")
    val media = Seq((1L, good), (2L, tiny), (3L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.imageHashes(media, col("doc_id"), col("payload"))
      .collect().map(_.getLong(0))
    assert(hashes.toSeq === Seq(1L))
  }

  test("toBmp24 size gate: pad-dominated narrow-tall shapes are rejected") {
    import Multimodal.MediaDecoder
    // w=1, h=2^29 passes the half-gigapixel cap (w*h = 2^29 exactly) but
    // its BMP re-encode is pad-dominated (rowBytes=4 -> 4*2^29 + 54
    // bytes), which wraps an Int — decodeImageIo's byte gate must reject
    // the shape so toBmp24 never allocates on it (never-throw contract)
    assert(MediaDecoder.bmp24Bytes(1L, 1L << 29) > Int.MaxValue.toLong)
    assert(MediaDecoder.bmp24Bytes(1L << 29, 1L) <= Int.MaxValue.toLong)
    // a realistic large image still fits
    assert(MediaDecoder.bmp24Bytes(8192L, 8192L) <= Int.MaxValue.toLong)
    // the arithmetic is exact: 54-byte header + 4-byte-padded rows
    assert(MediaDecoder.bmp24Bytes(3L, 2L) === 54L + 12L * 2)
  }

  test("audioSig60: WAV round-trip, loudness invariance, drop cases") {
    import Multimodal.MediaDecoder
    // deterministic samples; the signature must survive the byte round-trip
    val samples = Array.tabulate(61 * 64)(i => ((i * 7919) % 65536) - 32768)
    val wav = MediaDecoder.toWav16(samples)
    assert(MediaDecoder.wavSamples16(wav).get.toSeq === samples.toSeq)
    val sig = MediaDecoder.audioSig60(wav).get
    // loudness invariance: halving every sample scales all energies by 4
    // — the delta comparisons are unchanged
    val quiet = MediaDecoder.toWav16(samples.map(_ / 2))
    assert(MediaDecoder.audioSig60(quiet).get === sig)
    // non-degenerate signature
    val bits = java.lang.Long.bitCount(sig)
    assert(bits >= 10 && bits <= 50, s"degenerate signature: $bits bits")
    // drop cases: too short, stereo-unsupported marker, not a WAV
    assert(MediaDecoder.audioSig60(
      MediaDecoder.toWav16(samples.take(60 * 64))).isEmpty)
    assert(MediaDecoder.audioSig60("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(MediaDecoder.audioSig60(Array.emptyByteArray).isEmpty)
    // non-PCM format tag: an extensible (0xFFFE) or compressed-codec
    // header declaring 16-bit mono must be DROPPED, not misread as raw
    // PCM (garbage samples -> bogus signature polluting near-dup mining).
    // toWav16's fmt body starts at byte 20; tag is its first u16le.
    val nonPcm = wav.clone()
    nonPcm(20) = 0xFE.toByte; nonPcm(21) = 0xFF.toByte
    assert(MediaDecoder.wavSamples16(nonPcm).isEmpty)
    assert(MediaDecoder.audioSig60(nonPcm).isEmpty)
  }

  test("audioNearDupPairs: planted variant groups pair, cross-group never") {
    import spark.implicits._
    val docs = (0L until 8L).toDF("doc_id") // 2 groups of 4
    val wavs = Multimodal.demoWavCorpus(docs, col("doc_id"))
    val pairs = Multimodal.audioNearDupPairs(wavs, col("doc_id"),
        col("payload"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, _) => a / 4 == b / 4 },
      s"cross-group audio pair leaked: ${pairs.mkString(",")}")
    // silencing j frames flips at most j+1 delta bits: all pairs survive
    assert(pairs.length === 12) // both groups complete: 2 * C(4,2)
  }

  test("aHash60: JPEG re-encoding of a smooth image preserves the hash") {
    // horizontal gray gradient: cell means are well separated, so the
    // lossy JPEG round-trip may move lumas slightly but not across the
    // global average — the perceptual-robustness property aHash exists for
    val grad = (x: Int, y: Int) => { val v = x * 4; (v << 16) | (v << 8) | v }
    val img = testImage(64, 64, grad)
    val bmpHash = Multimodal.MediaDecoder.aHash60(
      Multimodal.MediaDecoder.toBmp24(img)).get
    val jpegHash = Multimodal.MediaDecoder.aHash60(
      encodeImage(img, "jpg")).get
    val hamming = java.lang.Long.bitCount(bmpHash ^ jpegHash)
    assert(hamming <= 4, s"jpeg round-trip moved $hamming aHash bits")
    // and the hash is non-degenerate (a gradient lights half the cells)
    assert(java.lang.Long.bitCount(bmpHash) >= 16 &&
      java.lang.Long.bitCount(bmpHash) <= 44)
  }

  test("demo corpus render spread is PINNED at defaultParallelism " +
      "(AQE cannot coalesce the byte-small group exchange)") {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    val docs = (0L until 64L).toDF("doc_id")
    // the render's input exchange is a user repartition — partition count
    // must equal defaultParallelism regardless of how small the shuffle
    // payload is (the Par.scala under-split trap, closed for MapGroups-
    // shaped renders by renderByGroup's explicit repartition)
    assert(Multimodal.demoBmpCorpus(docs, col("doc_id"))
      .rdd.getNumPartitions === par)
    assert(Multimodal.demoWavCorpus(docs, col("doc_id"))
      .rdd.getNumPartitions === par)
  }

  test("MediaFixtures: cached corpora are byte-identical to the inline " +
      "render and rebuild only when absent") {
    import spark.implicits._
    import graft.sources.MediaFixtures
    val tmp = java.nio.file.Files.createTempDirectory("media_cache_spec")
      .toString
    sys.props("spark.graft.mediaCache") = tmp
    try {
      val dir = "/root/testdata/sf0.001"
      def key(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Byte]] =
        df.collect().map(r =>
          r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // first call builds the cache; payloads match the inline render
      assert(key(MediaFixtures.bmpCorpus(spark, dir)) ===
        key(Multimodal.demoBmpCorpus(docs, col("doc_id"))))
      assert(key(MediaFixtures.wavCorpus(spark, dir)) ===
        key(Multimodal.demoWavCorpus(docs, col("doc_id"))))
      // the cache is real parquet with a _SUCCESS marker, and a second
      // call serves FROM it (tombstone the marker's mtime to prove no
      // rewrite happens)
      val marker = new java.io.File(
        MediaFixtures.cachePath(dir, "bmp", 4), "_SUCCESS")
      assert(marker.isFile)
      val stamp = 1234567890000L
      assert(marker.setLastModified(stamp))
      MediaFixtures.bmpCorpus(spark, dir)
      assert(marker.lastModified === stamp, "cache was rebuilt on a hit")
    } finally {
      sys.props.remove("spark.graft.mediaCache")
    }
  }
}
