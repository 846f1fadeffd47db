package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Similarity-search coverage: exact cosine sanity + recall floors for the
  * approximate (LSH / IVF) paths against the brute-force baseline on the
  * sf0.001 embeddings. The approximate paths have no SQL oracle — this spec
  * is their correctness gate. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("cosine(v, v) == 1") {
    val ones = emb.limit(5)
      .select(SimilarityOps.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(ones.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force top-k: k rows per query, ranks contiguous, cos descending") {
    val out = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .orderBy("q_id", "rank").collect()
    assert(out.length === 50)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).toSeq === (1 to 5))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("int8 quantization: range, zero-vector guard, dequant error <= scale/2") {
    val q = SimilarityOps.quantizeInt8(emb.limit(50), col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(q.nonEmpty && q.forall { case (_, _, _, v) => v >= -127 && v <= 127 })
    // dequantized component within scale/2 of the original
    val orig = emb.limit(50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    q.foreach { case (id, pos, scale, v) =>
      val x = orig(id)(pos).toDouble
      assert(math.abs(v * scale - x) <= scale / 2 + 1e-12,
        s"vec $id pos $pos: dequant ${v * scale} vs $x (scale $scale)")
    }
    // zero vector -> scale 0, all q 0
    import spark.implicits._
    val z = SimilarityOps.quantizeInt8(
      Seq((99L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding")).collect()
    assert(z.length == 4 && z.forall(r => r.getDouble(2) == 0.0 && r.getLong(3) == 0L))
  }

  test("LSH top-k recall floor") {
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries, 5))
    val appr = pairs(SimilarityOps.lshTopK(emb, queries, 5))
    val recall = (exact & appr).size.toDouble / exact.size
    info(s"lsh recall@5 = $recall")
    assert(recall >= 0.4, s"LSH recall@5 $recall below floor")
  }

  test("IVF top-k recall floor") {
    val codebook = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries, 5))
    val appr = pairs(SimilarityOps.ivfTopK(emb, queries, codebook, 5, nProbe = 4))
    val recall = (exact & appr).size.toDouble / exact.size
    info(s"ivf recall@5 = $recall")
    assert(recall >= 0.3, s"IVF recall@5 $recall below floor")
  }

  test("trained (k-means) codebook plugs into ivfTopK and meets the recall floor") {
    val (codebook, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 2)
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries, 5))
    val appr = pairs(SimilarityOps.ivfTopK(emb, queries, codebook, 5, nProbe = 4))
    val recall = (exact & appr).size.toDouble / exact.size
    info(s"trained-ivf recall@5 = $recall")
    assert(recall >= 0.3, s"trained-IVF recall@5 $recall below floor")
  }
}
