package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.SimilarityOps

/** Bit-equivalence pins for the native per-row codebook scans
  * (`graft_argmax_cos`, `graft_argmax_cos_grouped`, `graft_pq_codes`)
  * against the relational twins they replaced (broadcast crossJoin +
  * `min(struct)` argmax / argmin). The twins stay in the tree as the
  * vanilla-session fallback and the semantic definition; this spec is the
  * contract that the compiled scans return EXACTLY the same rows —
  * including the tie-breaks and the null/short/null-element embedding
  * degeneracies — so swapping plans can never change what an operator
  * computes (the s03/s06/s12-s22 oracle hashes are the end-to-end
  * witnesses). */
class ArgMaxCosSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def assignSet(df: DataFrame): Set[(Long, Int)] =
    df.select(col("vec_id").cast("long"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def pqSet(df: DataFrame): Set[(Long, Int, Int)] =
    df.select(col("vec_id").cast("long"), col("sub"), col("code"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

  private def indexSet(df: DataFrame): Set[(Long, Int, Int, Int)] =
    df.select(col("vec_id").cast("long"), col("sub"), col("code"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet

  test("ivfAssign: native scan == relational argmax (hash codebook, float corpus)") {
    val cb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val native = SimilarityOps.ivfAssign(emb, cb)
    val hof = SimilarityOps.ivfAssignHof(emb, cb)
    assert(assignSet(native) === assignSet(hof))
    assert(native.count() === emb.count())
  }

  test("ivfAssign: native scan == relational argmax (trained double-anchor codebook)") {
    val (cb, _) = SimilarityOps.kmeansFit(emb, nCells = 8, iters = 1)
    val cbM = cb.localCheckpoint(true) // one evaluation feeds both paths
    assert(assignSet(SimilarityOps.ivfAssign(emb, cbM)) ===
      assignSet(SimilarityOps.ivfAssignHof(emb, cbM)))
  }

  test("kmeansFit: native Lloyd loop == relational loop, bit-identical codebook and assignment") {
    val init = SimilarityOps.ivfCodebook(spark, nCells = 8, dim = 64)
    val (cbN, asgN) = SimilarityOps.kmeansFit(emb, 8, 2, init = Some(init))
    val (cbH, asgH) = SimilarityOps.kmeansFitHof(emb, 8, 2, init = Some(init))
    val n = cbN.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList))
    val h = cbH.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList))
    assert(n.map(_._1).toList === h.map(_._1).toList)
    n.zip(h).foreach { case ((c, an), (_, ah)) =>
      assert(an === ah, s"cell $c anchors differ") // exact ==, no tolerance
    }
    assert(assignSet(asgN) === assignSet(asgH))
  }

  test("pqEncode: native scan == relational argmin (deterministic and trained codebooks)") {
    val cb = SimilarityOps.pqCodebook(spark)
    assert(pqSet(SimilarityOps.pqEncode(emb, cb)) ===
      pqSet(SimilarityOps.pqEncodeHof(emb, cb)))
    // trained codebook: float means, sparse codes (empty cells dropped)
    val trained = SimilarityOps.pqTrain(emb, iters = 1).localCheckpoint(true)
    assert(pqSet(SimilarityOps.pqEncode(emb, trained)) ===
      pqSet(SimilarityOps.pqEncodeHof(emb, trained)))
  }

  test("ivfPqIndex: fused map-only build == relational assign-join-encode") {
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark)
    assert(indexSet(SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb)) ===
      indexSet(SimilarityOps.ivfPqIndexHof(emb, ivfCb, pqCb)))
  }

  test("ivfPqResidualIndex: native build == relational build, scales bit-identical") {
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark)
    val (idxN, scN) = SimilarityOps.ivfPqResidualIndex(emb, ivfCb, pqCb)
    val (idxH, scH) = SimilarityOps.ivfPqResidualIndexHof(emb, ivfCb, pqCb)
    assert(indexSet(idxN) === indexSet(idxH))
    val aN = scN.orderBy("sub").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val aH = scH.orderBy("sub").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(aN.toList === aH.toList) // exact double ==, no tolerance
  }

  test("prunedAssign: fused grouped scan == relational two-stage rank (dead group filtered)") {
    val (icb, _) = SimilarityOps.kmeansFit(emb, nCells = 16, iters = 1)
    val icbM = icb.localCheckpoint(true)
    val gcb = SimilarityOps.ivfCodebook(spark, nCells = 4, dim = 64)
      .select(col("cell").as("grp"), col("anchor").as("ganchor"))
    // a group no centroid routes to must be pruned from the point rank by
    // BOTH paths (the live-group filter / liveGcb join)
    val gcbWithDead = gcb.union(
      gcb.limit(1).select(lit(99).as("grp"), col("ganchor")))
    val centGrp = SimilarityOps.ivfAssign(
        icbM.select(col("cell").as("vec_id"), col("anchor").as("embedding")),
        gcb.select(col("grp").as("cell"), col("ganchor").as("anchor")))
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("anchor"), col("cell").as("grp"))
      .localCheckpoint(true)
    val native = SimilarityOps.prunedAssign(emb, gcbWithDead, centGrp)
    val hof = SimilarityOps.prunedAssignHof(emb, gcbWithDead, centGrp)
    assert(assignSet(native) === assignSet(hof))
    assert(native.count() === emb.count()) // no point drops out
  }

  test("degenerate embeddings (null / short / null-element / zero) agree with the relational form") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val rows = Seq(
      Row(1L, Seq(0.5f, -0.25f, 1.0f, 0.0f)),
      Row(2L, null), // null array -> every cos null -> lowest cell/code
      Row(3L, Seq(0.5f)), // length mismatch -> same
      Row(4L, Seq(0.5f, null, 1.0f, 0.0f)), // null element -> same
      Row(6L, Seq(1.0f, 1.0f, -1.0f, 0.5f)))
    val edge = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    import spark.implicits._
    val cb4 = Seq(
      (3, Seq(1.0, 0.0, 0.0, 0.0)),
      (5, Seq(0.0, 1.0, 0.0, 0.0)),
      (7, Seq(-1.0, 0.5, 0.25, 1.0))).toDF("cell", "anchor")
    assert(assignSet(SimilarityOps.ivfAssign(edge, cb4)) ===
      assignSet(SimilarityOps.ivfAssignHof(edge, cb4)))
    val pqCb4 = Seq(
      (0, 2, Seq(1.0, 0.0)), (0, 4, Seq(0.0, 1.0)),
      (1, 2, Seq(1.0, 1.0)), (1, 4, Seq(-1.0, 0.5))).toDF("sub", "code", "anchor")
    assert(pqSet(SimilarityOps.pqEncode(edge, pqCb4, m = 2, dim = 4)) ===
      pqSet(SimilarityOps.pqEncodeHof(edge, pqCb4, m = 2, dim = 4)))
  }

  test("zero vector: native scan assigns (NaN-cos tie, lowest cell); relational form is ANSI-rejected") {
    // The one deliberate divergence: cosine's divide hits a 0 norm, which
    // under Spark 4 ANSI aborts the relational query (DIVIDE_BY_ZERO), so
    // no declared query can ever have computed anything on a zero vector.
    // The compiled scan is a total function: every cos is NaN, NaN == NaN
    // ties everywhere, and min(struct)'s tie-break picks the lowest cell.
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    val zero = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, Seq(0.0f, 0.0f, 0.0f, 0.0f))), 1), schema)
    import spark.implicits._
    val cb4 = Seq(
      (3, Seq(1.0, 0.0, 0.0, 0.0)),
      (7, Seq(-1.0, 0.5, 0.25, 1.0))).toDF("cell", "anchor")
    assert(assignSet(SimilarityOps.ivfAssign(zero, cb4)) === Set((1L, 3)))
    val e = intercept[Exception] {
      SimilarityOps.ivfAssignHof(zero, cb4).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"))
  }
}
