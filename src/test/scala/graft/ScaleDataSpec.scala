package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tools.ScaleData

/** Regression coverage for the ScaleData fixture generator's composition
  * rules (ADVICE r14 medium; VERDICT r14 task 2). The trap being guarded:
  * dim rotations do NOT compose injectively, so composing an
  * already-scaled dir (strideMult > 1) over `embeddings` could plant
  * exact cross-copy duplicate vectors under distinct vec_ids and silently
  * corrupt every similarity/dedup decade fixture built from it. The
  * supported recipes (single-pass embeddings at full factor; documents
  * composed via the word-tag bijection) must stay duplicate-free, and the
  * unsupported one must FAIL FAST, not degrade.
  */
class ScaleDataSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("scaledata-spec").toString

  /** 8 deterministic 64-dim vectors with position-distinct values — a
    * constant vector would be rotation-invariant and mask the very
    * duplicate-planting this spec exists to catch. */
  private def miniEmbeddings(): DataFrame = {
    import spark.implicits._
    (0L until 8L).map { i =>
      (i, (0 until 64).map(j => (i * 64 + j).toFloat).toArray, i.toInt % 3)
    }.toDF("vec_id", "embedding", "label")
  }

  /** 6 documents over a digit-free vocabulary (the word-tag composition
    * layer relies on the base vocab carrying no digit suffixes), with the
    * planted exact-dup pair (docs 4/5) the dedup fixtures rely on. */
  private def miniDocuments(): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta", "en", "src0"),
      (1L, "beta gamma delta epsilon", "en", "src0"),
      (2L, "epsilon zeta eta theta", "en", "src1"),
      (3L, "theta alpha zeta beta", "en", "src1"),
      (4L, "gamma gamma delta alpha", "en", "src2"),
      (5L, "gamma gamma delta alpha", "en", "src2")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("single-pass embeddings scaling plants zero exact-duplicate vectors") {
    val in = tmp(); val out = tmp()
    miniEmbeddings().write.mode("overwrite").parquet(s"$in/embeddings.parquet")
    ScaleData.run(spark, in, out, factor = 16, tables = Set("embeddings"),
      strideMult = 1L)
    val scaled = spark.read.parquet(s"$out/embeddings.parquet")
    assert(scaled.count() === 16 * 8)
    assert(scaled.select("vec_id").distinct().count() === 16 * 8)
    // the fixture-integrity property itself: every vector is distinct —
    // no rotation pair collided, no copy was emitted untransformed twice
    assert(scaled.select("embedding").distinct().count() === 16 * 8)
    // rotations preserve norms exactly (float-exact: same values, reordered)
    val norms = scaled
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
      .distinct().count()
    assert(norms === 8, "rotation must preserve each base vector's norm")
  }

  test("embedding scaling stays injective past the 128-copy legacy ceiling") {
    // 64 rotations × 2 global signs exhaust at 128 copies; the Rademacher
    // sign-diagonal extension (k >= 128) must keep every copy's transform
    // distinct while preserving norms exactly — this is the property the
    // factor-1000 sf100 embeddings table rides on
    val in = tmp(); val out = tmp()
    miniEmbeddings().write.mode("overwrite").parquet(s"$in/embeddings.parquet")
    ScaleData.run(spark, in, out, factor = 200, tables = Set("embeddings"),
      strideMult = 1L)
    val scaled = spark.read.parquet(s"$out/embeddings.parquet")
    assert(scaled.count() === 200 * 8)
    assert(scaled.select("embedding").distinct().count() === 200 * 8)
    val norms = scaled
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")).as("n2"))
      .distinct().count()
    assert(norms === 8, "sign diagonal must preserve each base vector's norm")
    // legacy region byte-stability: copy 1 of base vec 0 is exactly the
    // rotation-by-13 of the base values (the pre-extension transform) —
    // fixtures built before the extension reproduce bit-for-bit
    val base = (0 until 64).map(j => j.toFloat)
    val copy1 = scaled.filter(col("vec_id") === ScaleData.VecStride)
      .select("embedding").head().getSeq[Double](0)
    assert(copy1 === (0 until 64).map(i => base((i + 13) % 64) * 1.0d))
  }

  test("composing embeddings from an already-scaled dir fails fast") {
    val in = tmp(); val mid = tmp(); val out = tmp()
    miniEmbeddings().write.mode("overwrite").parquet(s"$in/embeddings.parquet")
    ScaleData.run(spark, in, mid, factor = 4, tables = Set("embeddings"),
      strideMult = 1L)
    val e = intercept[IllegalArgumentException] {
      ScaleData.run(spark, mid, out, factor = 4, tables = Set("embeddings"),
        strideMult = 4L)
    }
    assert(e.getMessage.contains("do not compose injectively"))
    // and the guard must not have left a partial corrupt output behind
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/embeddings.parquet")))
  }

  test("documents compose sf-style (affine then word-tag) duplicate-free") {
    val in = tmp(); val mid = tmp(); val out = tmp()
    val base = miniDocuments()
    base.write.mode("overwrite").parquet(s"$in/documents.parquet")
    val baseDistinct = base.select("text").distinct().count() // 5 (4≡5)
    ScaleData.run(spark, in, mid, factor = 4, tables = Set("documents"),
      strideMult = 1L)
    ScaleData.run(spark, mid, out, factor = 4, tables = Set("documents"),
      strideMult = 4L)
    val sf16 = spark.read.parquet(s"$out/documents.parquet")
    assert(sf16.count() === 16 * 6)
    assert(sf16.select("doc_id").distinct().count() === 16 * 6)
    // zero UNEXPECTED exact duplicates: each of the 16 copies carries a
    // bijectively-substituted image of the corpus, so distinct texts ==
    // 16 × base distinct — any affine/tag-layer collision across copies
    // would collapse this count (the factor-100 pigeonhole bug's signature)
    assert(sf16.select("text").distinct().count() === 16 * baseDistinct)
    // the bijection preserves the within-copy planted dup pair: every copy
    // still contains exactly one duplicated text
    val dupTexts = sf16.groupBy("text").count().filter(col("count") > 1)
    assert(dupTexts.count() === 16)
    assert(dupTexts.agg(max("count")).head().getLong(0) === 2L)
  }
}
