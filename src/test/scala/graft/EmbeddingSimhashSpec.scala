package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Bit-equivalence of the native per-row
  * [[graft.functions.EmbeddingSimhash60]] sketch against the
  * `transform`+`aggregate` HOF formulation it replaced
  * (`SimilarityOps.embeddingSimhashHof`): identical fingerprints on
  * adversarial vector edges and a randomized corpus, for both
  * array<float> and array<double> inputs and non-default dims. The
  * d18/d19/d22 DuckDB oracles replay the same planes against the HOF
  * semantics, so equality here is what keeps those keys pinned.
  */
class EmbeddingSimhashSpec extends SparkSpec {

  private def assertEquivalent(df: org.apache.spark.sql.DataFrame,
                               dim: Int): Unit = {
    val native = SimilarityOps.embeddingSimhash(df, col("vec_id"),
        col("embedding"), dim)
      .withColumnRenamed("simhash", "n")
    val hof = SimilarityOps.embeddingSimhashHof(df, col("vec_id"),
        col("embedding"), dim)
      .withColumnRenamed("simhash", "h")
    val bad = native.join(hof, Seq("doc_id"), "full_outer")
      .filter(not(col("n") <=> col("h"))).collect()
    if (bad.nonEmpty) {
      val r = bad.head
      fail(s"${bad.length} mismatching vectors; first: doc_id=${r.get(0)} " +
        s"native=${r.get(1)} hof=${r.get(2)}")
    }
  }

  test("adversarial vector edges match the HOF formulation exactly") {
    import spark.implicits._
    val dim = 8
    val rows: Seq[(Long, Seq[java.lang.Float])] = Seq(
      (1L, Seq.fill(dim)(java.lang.Float.valueOf(0.0f))), // all-zero: every proj 0, never > 0
      (2L, Seq.fill(dim)(java.lang.Float.valueOf(1.0f))),
      (3L, Seq.fill(dim)(java.lang.Float.valueOf(-1.0f))),
      (4L, (0 until dim).map(i => java.lang.Float.valueOf(if (i % 2 == 0) 1e30f else -1e30f))),
      (5L, (0 until dim).map(i => java.lang.Float.valueOf(i - dim / 2.0f))),
      (6L, Seq.fill(dim)(java.lang.Float.valueOf(Float.NaN))), // NaN proj: Spark NaN > 0 is TRUE -> all bits set
      (7L, (0 until dim).map(i => java.lang.Float.valueOf(
        if (i == 0) Float.PositiveInfinity else 1.0f))),
      (8L, (0 until dim - 1).map(_ => java.lang.Float.valueOf(1.0f))), // wrong dim -> 0L
      (9L, Seq.fill(dim + 3)(java.lang.Float.valueOf(1.0f))), // wrong dim -> 0L
      (10L, (0 until dim).map(i => if (i == 3) null
        else java.lang.Float.valueOf(1.0f))), // null element -> 0L
      (11L, null) // null vector -> 0L
    )
    assertEquivalent(rows.toDF("vec_id", "embedding"), dim)
    // the degenerate rows really do sketch to 0 on the native path
    val fp = SimilarityOps.embeddingSimhash(rows.toDF("vec_id", "embedding"),
        col("vec_id"), col("embedding"), dim)
      .filter(col("doc_id") >= 8).collect()
    assert(fp.forall(_.getLong(1) == 0L), fp.mkString(", "))
  }

  test("randomized float corpus matches the HOF formulation exactly (dim 64)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xe514L)
    val rows = (1 to 400).map { i =>
      (i.toLong, Seq.fill(64)(((rnd.nextDouble() - 0.5) * 4).toFloat))
    }
    assertEquivalent(rows.toDF("vec_id", "embedding"), 64)
  }

  test("double-typed arrays match too (dim 16)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x516L)
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextDouble() - 0.5) * 10))
    }
    assertEquivalent(rows.toDF("vec_id", "embedding"), 16)
  }

  test("the native plan has no shuffle and no HOF: per-row projection only") {
    import spark.implicits._
    val pq = java.nio.file.Files
      .createTempDirectory("graft_esh_plan").resolve("t.parquet").toString
    Seq((1L, Seq.fill(64)(0.5f)), (2L, Seq.fill(64)(-0.5f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(pq)
    val plan = SimilarityOps.embeddingSimhash(spark.read.parquet(pq),
        col("vec_id"), col("embedding"), 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_embedding_simhash"), plan)
    assert(!plan.contains("Exchange"),
      s"per-vector sketch plan should not shuffle:\n$plan")
    assert(!plan.contains("transform"),
      s"native path should not carry the interpreted HOF chain:\n$plan")
  }
}
