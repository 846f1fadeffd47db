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

  test("exact re-rank buys back the ADC resolution limit on clustered " +
      "data (the s16 two-stage search)") {
    // Measured context for the s15 eval number: the s15 oracle key pins
    // recall of the ORACLE-REPLAYABLE one-stage configuration (hash ±1
    // codebooks, ADC-only ranking), which is LOW by construction — ADC
    // ranks between clusters but not finely within one (same-cluster
    // vectors share codes), and codebook TRAINING cannot add that
    // resolution (measured on the sf0.001 embeddings: hash 0.20 vs
    // trained 0.12; on this planted corpus ADC-only 0.10 either way).
    // The production answer is the two-stage search: ADC shortlist from
    // compressed codes, exact cosine over just those rows.
    import spark.implicits._
    import graft.functions.Hashing.hash60Scalar
    val nClusters = 8
    val perCluster = 30
    def unit(tag: String, i: Int): Double =
      (hash60Scalar(s"$tag:$i") % 2001L - 1000L).toDouble / 1000.0
    val corpus = (for (c <- 0 until nClusters; j <- 0 until perCluster) yield {
      val v = Array.tabulate(64) { d =>
        (unit(s"ctr_$c", d) * 10.0 + unit(s"pt_${c}_$j", d)).toFloat
      }
      ((c * perCluster + j).toLong, v)
    }).toDF("vec_id", "embedding").localCheckpoint(true)
    val cq = corpus.filter(col("vec_id") % perCluster === 0)
    val exact = pairs(SimilarityOps.bruteForceTopK(corpus, cq, 5))
    def recallOf(ivfCb: org.apache.spark.sql.DataFrame,
                 pqCb: org.apache.spark.sql.DataFrame): Double = {
      val appr = pairs(SimilarityOps.ivfPqTopK(
        SimilarityOps.pqEncode(corpus, pqCb),
        SimilarityOps.ivfAssign(corpus, ivfCb).select("vec_id", "cell"),
        cq, ivfCb, pqCb, topK = 5, nProbe = 2))
      (exact & appr).size.toDouble / exact.size
    }
    def rerankedRecallOf(ivfCb: org.apache.spark.sql.DataFrame,
                         pqCb: org.apache.spark.sql.DataFrame): Double = {
      val appr = pairs(SimilarityOps.ivfPqTopKReranked(
        SimilarityOps.ivfPqIndex(corpus, ivfCb, pqCb), corpus,
        cq, ivfCb, pqCb, topK = 5, shortlistR = 20, nProbe = 2))
      (exact & appr).size.toDouble / exact.size
    }
    val hashPq = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val hashIvf = SimilarityOps.ivfCodebook(spark, nCells = 8, dim = 64)
    val (trainedIvf, _) = SimilarityOps.kmeansFit(corpus, nCells = 8,
      iters = 3)
    val trainedPq = SimilarityOps.pqTrain(corpus, m = 8, k = 16, iters = 3)
    val adcR = recallOf(trainedIvf, trainedPq)
    val rrHash = rerankedRecallOf(hashIvf, hashPq)
    val rrTrained = rerankedRecallOf(trainedIvf, trainedPq)
    info(s"clustered ivfpq recall@5: adc-only=$adcR " +
      s"reranked(hash)=$rrHash reranked(trained)=$rrTrained")
    // the re-rank must improve decisively on ADC-only under BOTH codebook
    // configurations (measured here: 0.10 -> 0.775 hash / 0.675 trained;
    // the residual gap to 1.0 is cell-probe recall, the IVF side's knob)
    assert(rrTrained > adcR && rrHash > adcR,
      s"re-rank did not improve on ADC-only: $rrTrained/$rrHash vs $adcR")
    assert(math.max(rrHash, rrTrained) >= 0.6,
      s"two-stage recall@5 below the clustered floor: $rrHash/$rrTrained")
    // ...and that residual IS the coarse quantizer's to close: under the
    // SAME (hash) PQ codes, training only the cells (the s17 config —
    // two nano-grid Lloyd iterations) must not lose to the hash cells on
    // the two-stage search (measured here: 0.775 -> 0.775, a tie — this
    // fixture's clusters are spread enough that nProbe=2 hash probing
    // already finds the right cells; the oracle-pinned s15/s18 pair
    // measures the regime where training DOES move it, 0.06 -> 0.12
    // recall / 0.07 -> 0.14 MRR on the sf0.01 embeddings, and
    // IvfRecallSweep records the sf0.1/sf1 decades).
    val (trainedIvf2, _) = SimilarityOps.kmeansFit(corpus, nCells = 8,
      iters = 2, init = Some(hashIvf))
    val rrTrainedCells = rerankedRecallOf(trainedIvf2, hashPq)
    info(s"clustered reranked recall@5, trained cells + hash codes: $rrTrainedCells")
    assert(rrTrainedCells >= rrHash,
      s"trained coarse quantizer lost to hash cells: $rrTrainedCells < $rrHash")
    // RESIDUAL encoding (the s19 config) attacks the same within-cell
    // resolution limit from the ENCODE side: codes quantize x − μ_cell,
    // so same-cell vectors — which share nearly identical raw codes on
    // this fixture (cluster radius 1 around centers of norm ~10·8) — get
    // DISTINCT residual codes. One-stage residual ADC must therefore
    // improve on one-stage raw ADC under the same cells and codes
    // (measured here: 0.20 → 0.25; the ±1 hash codebook's 16-of-256 sign
    // patterns per subspace cap how much of the residual it can express —
    // the scalar α fixes the SCALE mismatch, not the direction coverage —
    // and on the sf0.01 corpus the same switch moves recall@5 0.12 → 0.14
    // and MRR 0.14 → 0.26, the oracle-pinned s18-vs-s20 delta).
    def residualRecallOf(ivfCb: org.apache.spark.sql.DataFrame,
                         pqCb: org.apache.spark.sql.DataFrame): Double = {
      val (idx, scales) = SimilarityOps.ivfPqResidualIndex(corpus, ivfCb, pqCb)
      val appr = pairs(SimilarityOps.ivfPqResidualTopK(idx, scales, cq,
        ivfCb, pqCb, topK = 5, nProbe = 2))
      (exact & appr).size.toDouble / exact.size
    }
    val adcRawSame = recallOf(trainedIvf2, hashPq)
    val adcResidual = residualRecallOf(trainedIvf2, hashPq)
    info(s"clustered one-stage recall@5, trained cells + hash codes: " +
      s"raw=$adcRawSame residual=$adcResidual")
    assert(adcResidual > adcRawSame,
      s"residual encoding did not improve one-stage ADC: " +
        s"$adcResidual <= $adcRawSame")
  }

  /** Vectors built by concatenating codebook anchors for known codes: the
    * encoder must return exactly those codes (anchors are distinct by
    * construction — code bits occupy the low dims — and a ±1 corner is the
    * unique L2-nearest corner to itself). */
  private def plantedFromCodes(codes: Map[Long, Seq[Int]]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val cb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    codes.toSeq.map { case (id, cs) =>
      (id, cs.zipWithIndex.flatMap { case (c, sub) => cb((sub, c)) }
        .map(_.toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("pqEncode: planted codebook points round-trip to their codes") {
    val planted = Map(
      1L -> Seq(0, 1, 2, 3, 4, 5, 6, 7),
      2L -> Seq(15, 14, 13, 12, 11, 10, 9, 8),
      3L -> Seq(7, 7, 7, 7, 7, 7, 7, 7))
    val cb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val got = SimilarityOps.pqEncode(plantedFromCodes(planted), cb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    planted.foreach { case (id, cs) =>
      cs.zipWithIndex.foreach { case (c, sub) =>
        assert(got((id, sub)) === c, s"vec $id sub $sub")
      }
    }
  }

  test("pqEncode: 8 codes per vector over the real corpus, codes in [0,16)") {
    val cb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val enc = SimilarityOps.pqEncode(emb, cb).collect()
    assert(enc.length === emb.count() * 8)
    assert(enc.forall { r => val c = r.getInt(2); c >= 0 && c < 16 })
  }

  test("pqAdcTopK: an identically-coded twin wins on planted codebook points") {
    val cb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    // corpus: 2L is vec 1L's exact codebook twin, 3L..6L differ in all subs
    val corpus = plantedFromCodes(Map(
      2L -> Seq(0, 1, 2, 3, 4, 5, 6, 7),
      3L -> Seq(15, 14, 13, 12, 11, 10, 9, 8),
      4L -> Seq(8, 9, 10, 11, 12, 13, 14, 15),
      5L -> Seq(1, 2, 3, 4, 5, 6, 7, 0),
      6L -> Seq(3, 3, 3, 3, 3, 3, 3, 3)))
    val q = plantedFromCodes(Map(1L -> Seq(0, 1, 2, 3, 4, 5, 6, 7)))
    val top = SimilarityOps.pqAdcTopK(
        SimilarityOps.pqEncode(corpus, cb), q, cb, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(top === Seq((1L, 2L)), "the exact-code twin must rank first")
  }

  test("ivfPqTopK: twin wins with full probing; candidates honor the probed cells") {
    import spark.implicits._
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val corpus = plantedFromCodes(Map(
      2L -> Seq(0, 1, 2, 3, 4, 5, 6, 7), // 1L's exact codebook twin
      3L -> Seq(15, 14, 13, 12, 11, 10, 9, 8),
      4L -> Seq(8, 9, 10, 11, 12, 13, 14, 15),
      5L -> Seq(1, 2, 3, 4, 5, 6, 7, 0),
      6L -> Seq(3, 3, 3, 3, 3, 3, 3, 3)))
    val q = plantedFromCodes(Map(1L -> Seq(0, 1, 2, 3, 4, 5, 6, 7)))
    val assigned = SimilarityOps.ivfAssign(corpus, ivfCb).select("vec_id", "cell")
    val encoded = SimilarityOps.pqEncode(corpus, pqCb)
    // nProbe = nCells: probing excludes nothing, so ADC alone ranks — the
    // identically-coded twin must win (the pqAdcTopK contract, on the
    // exact nano grid)
    val top = SimilarityOps.ivfPqTopK(encoded, assigned, q, ivfCb, pqCb,
        topK = 1, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(top === Seq((1L, 2L)), "the exact-code twin must rank first")
    // structural: with nProbe = 1, every returned neighbor lives in the
    // query's single probed cell
    val cells = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qCell = SimilarityOps.ivfAssign(q, ivfCb).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap // (vec_id, embedding, cell)
    val probed1 = SimilarityOps.ivfPqTopK(encoded, assigned, q, ivfCb, pqCb,
        topK = 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(probed1.nonEmpty)
    probed1.foreach { case (qid, nn) =>
      assert(cells(nn) === qCell(qid),
        s"nn $nn (cell ${cells(nn)}) outside q$qid's probed cell ${qCell(qid)}")
    }
  }

  /** Mean squared reconstruction error of a codebook over the corpus —
    * the quantity PQ training minimizes (recall@k on this corpus is too
    * noisy to gate training on: neighbors are near-orthogonal, so tiny
    * score perturbations reorder ranks). */
  private def reconMse(codebook: org.apache.spark.sql.DataFrame): Double = {
    val enc = SimilarityOps.pqEncode(emb, codebook)
    enc.join(codebook, Seq("sub", "code"))
      .join(emb, "vec_id")
      .select(aggregate(
        zip_with(
          slice(col("embedding"), col("sub") * 8 + 1, lit(8)),
          col("anchor"),
          (x, a) => (x.cast("double") - a) * (x.cast("double") - a)),
        lit(0.0), (acc, x) => acc + x).as("e2"))
      .agg(avg(col("e2"))).collect().head.getDouble(0)
  }

  test("pqTrain: trained codebook crushes the hash codebook's reconstruction error") {
    val hashCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val trained = SimilarityOps.pqTrain(emb, m = 8, k = 16, iters = 3)
    val (mseHash, mseTrained) = (reconMse(hashCb), reconMse(trained))
    info(s"recon mse: hash=$mseHash trained=$mseTrained")
    // ±1 anchors have norm² 8 vs tiny real subvectors — training must cut
    // the error by far more than half
    assert(mseTrained < 0.5 * mseHash,
      s"trained $mseTrained not < 0.5 * hash $mseHash")
    // trained ADC search still works end-to-end with a usable recall floor
    // (measured ~0.14-0.16 on this corpus; floor leaves noise headroom)
    val exact = pairs(SimilarityOps.bruteForceTopK(emb, queries, 5))
    val adc = pairs(SimilarityOps.pqAdcTopK(
      SimilarityOps.pqEncode(emb, trained), queries, trained, topK = 5))
    val recall = (exact & adc).size.toDouble / exact.size
    info(s"trained pq-adc recall@5 = $recall")
    assert(recall >= 0.06, s"trained PQ-ADC recall@5 $recall below floor")
  }

  test("groupCentroids: exact hand-checked means, order-independent across partitionings") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("e", ArrayType(FloatType))))
    val rows = Seq(
      Row("a", Seq(1.0f, -2.0f)), Row("a", Seq(3.0f, 4.0f)),
      Row("b", Seq(0.5f, 0.5f)))
    def df(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), schema)
    def centroids(parts: Int) =
      SimilarityOps.groupCentroids(df(parts), col("g"), col("e"))
        .orderBy("grp", "pos").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val got = centroids(3)
    assert(got.toSeq === Seq(
      ("a", 0, 2L, 2.0), ("a", 1, 2L, 1.0),
      ("b", 0, 1L, 0.5), ("b", 1, 1L, 0.5)))
    assert(centroids(1).toSeq === got.toSeq) // partitioning-invariant
  }

  test("hardNegatives: positives excluded BEFORE ranking, not after") {
    import spark.implicits._
    val q = emb.filter(col("vec_id") < 10)
    val positives = q.select(col("vec_id").as("q_id"), col("label").as("__l"))
      .join(emb.select(col("vec_id").as("pos_id"), col("label").as("__l")), "__l")
      .select("q_id", "pos_id")
    val got = SimilarityOps.hardNegatives(emb, q, positives, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // no same-label survivor
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.forall { case (qid, _, nn) => labels(qid) != labels(nn) })
    // equals "rank the filtered candidate set": lshTopK with unbounded k,
    // drop positives, re-rank, take 5
    val posSet = positives.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = SimilarityOps.lshTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val want = all.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(_._2).filterNot(r => posSet((qid, r._3))).take(5)
        .zipWithIndex.map { case (r, i) => (qid, i + 1, r._3) }.toSeq
    }.toSet
    assert(got.toSet === want)
    assert(got.groupBy(_._1).forall(_._2.length == 5))
  }

  test("annEvalMetrics: hand fixture — hits, recall, reciprocal rank") {
    import spark.implicits._
    // truth q1: {10,11,12}; result q1 ranks: 1->99 (miss), 2->11 (hit),
    // 3->12 (hit) => hits 2, recall 2/3, first hit rank 2.
    // truth q2: {20}; result q2: all misses => zeros, null first rank.
    val truth = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L), (2L, 1, 20L))
      .toDF("q_id", "rank", "nn_id")
    val result = Seq((1L, 1, 99L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 98L), (2L, 2, 97L)).toDF("q_id", "rank", "nn_id")
    val got = SimilarityOps.annEvalMetrics(result, truth)
      .orderBy("q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 666666L, Some(2), 500000L),
      (2L, 1L, 0L, 0L, None, 0L)))
  }

  test("randomProject matches the driver-side signed-sum reference") {
    import spark.implicits._
    import graft.functions.Hashing.hash60Scalar
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 2.0f, -1.0f)),
      (3L, Seq(-1.5f, 0.5f, 3.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    def sign(i: Int, j: Int) = if (hash60Scalar(s"rp:$i:$j") % 2 == 0) 1L else -1L
    val want = (for ((id, e) <- vecs; j <- 0 until 2) yield {
      val s = e.zipWithIndex.map { case (x, i) =>
        math.round(x.toDouble * 1e6) * sign(i, j)
      }.sum
      (id, j, s)
    }).toSet
    val got = SimilarityOps.randomProject(df, col("vec_id"), col("embedding"),
        inDim = 3, outDim = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("randomProject: JL projection roughly preserves cosine ranking") {
    // exactness is pinned by the s08 oracle; here check the PURPOSE — on
    // the real 64-dim corpus projected to 16, high-cosine pairs stay
    // closer in projected space than random pairs on average
    val proj = SimilarityOps.randomProject(emb.limit(60), col("vec_id"),
        col("embedding"), inDim = 64, outDim = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(_.getLong(2).toDouble) }
    def cosP(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val full = emb.limit(60).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val ids = full.keys.toSeq.sorted
    val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
    val scored = pairs.map { case (a, b) =>
      (cosP(full(a), full(b)), cosP(proj(a).toArray, proj(b).toArray)) }
    val (hi, lo) = scored.sortBy(-_._1).splitAt(scored.size / 4)
    val hiProj = hi.map(_._2).sum / hi.size
    val loProj = lo.map(_._2).sum / lo.size
    assert(hiProj > loProj,
      s"projected cosine should track full cosine: hi=$hiProj lo=$loProj")
  }

  test("mmrRerank diversifies a redundant top-k; degenerates to top-k at lambda=1") {
    import spark.implicits._
    // candidates for query 0: A(10) rel .95, B(11) rel .94 but a near-dup
    // of A, C(12) rel .80 and orthogonal to both
    val cand = Seq((0L, 10L, 0.95), (0L, 11L, 0.94), (0L, 12L, 0.80))
      .toDF("q_id", "nn_id", "cos")
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(1.0f, 0.1f)),
      (12L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val mmr = SimilarityOps.mmrRerank(cand, vecs, k = 3, lambdaPpm = 700000L)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    // pick A first; B's redundancy (cos ~0.995 to A) demotes it below C
    assert(mmr === Seq(10L, 12L, 11L))
    // lambda=1: pure relevance order — plain top-k
    val top = SimilarityOps.mmrRerank(cand, vecs, k = 3, lambdaPpm = 1000000L)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(top === Seq(10L, 11L, 12L))
    // a query with fewer candidates than k stops early, no padding
    val short = SimilarityOps.mmrRerank(cand.filter(col("nn_id") === 10L),
      vecs, k = 3, lambdaPpm = 700000L).collect()
    assert(short.length === 1)
    // candidates without a vector are excluded from EVERY round — the
    // covered candidates still fill all reachable picks
    val partial = SimilarityOps.mmrRerank(cand, vecs.filter(col("vec_id") =!= 10L),
        k = 3, lambdaPpm = 700000L)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    assert(partial === Seq(11L, 12L)) // 10 uncovered: 11 leads, 12 follows
  }

  test("embeddingNearDupPairs: exact copies always pair, perturbed twins mostly, strangers never") {
    import spark.implicits._
    // deterministic base vectors; for each base: one EXACT copy (hamming 0
    // by construction — the pigeonhole guarantees it pairs) and one lightly
    // perturbed twin (near-identical cosine, few sketch bits move)
    def vec(seed: Int): Array[Double] = Array.tabulate(16) { d =>
      ((graft.functions.Hashing.hash60Scalar(s"env_${seed}_$d") % 2001) - 1000) / 1000.0
    }
    val rows =
      (0 until 20).map(i => (i.toLong, vec(i))) ++
      (0 until 20).map(i => (100L + i, vec(i))) ++                    // exact copies
      (0 until 20).map { i =>
        val v = vec(i); v(0) *= 1.2; (200L + i, v)                    // perturbed twins
      }
    val corpus = rows.toDF("vec_id", "embedding")
    val pairs = SimilarityOps.embeddingNearDupPairs(corpus,
        threshold = 0.95, maxHamming = 3, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every exact copy pairs with its base (xor of identical sketches = 0)
    (0 until 20).foreach(i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"exact copy $i missed"))
    // perturbed twins: deterministic-sketch recall is high but not total —
    // require most of the planted family found (base-twin or copy-twin)
    val twinHits = (0 until 20).count(i =>
      pairs.contains((i.toLong, 200L + i)) || pairs.contains((100L + i, 200L + i)))
    assert(twinHits >= 14, s"only $twinHits/20 perturbed twins found")
    // and no cross-family pair survives the cosine verify
    def fam(id: Long) = id % 100
    assert(pairs.forall { case (a, b) => fam(a) == fam(b) },
      s"cross-family pair leaked: ${pairs.filterNot { case (a, b) => fam(a) == fam(b) }}")
  }

  test("crossEmbeddingNearDupPairs: pairs cross sides only, never within a side") {
    import spark.implicits._
    def vec(seed: Int): Array[Double] = Array.tabulate(16) { d =>
      ((graft.functions.Hashing.hash60Scalar(s"cenv_${seed}_$d") % 2001) - 1000) / 1000.0
    }
    // the NEW side carries an internal duplicate pair (10, 11) that must
    // NOT be emitted — incremental ingestion only scores new-vs-corpus;
    // the same vectors split across sides MUST be found
    val newSide = Seq((10L, vec(1)), (11L, vec(1)), (12L, vec(2)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((20L, vec(1)), (21L, vec(3))).toDF("vec_id", "embedding")
    val got = SimilarityOps.crossEmbeddingNearDupPairs(newSide, corpus,
        threshold = 0.95, maxHamming = 3, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 20L), (11L, 20L)), s"got $got")
    // empty corpus -> empty result, no failure
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(SimilarityOps.crossEmbeddingNearDupPairs(newSide, empty,
      threshold = 0.95, maxHamming = 3, dim = 16).count() === 0L)
    // a sketch-dim mismatch fails LOUDLY: wrong-dim vectors would sketch
    // to hash 0 via null dots and collapse candidates into all-pairs
    val ex = intercept[IllegalArgumentException] {
      SimilarityOps.embeddingNearDupPairs(newSide,
        threshold = 0.95, maxHamming = 3, dim = 64)
    }
    assert(ex.getMessage.contains("dims [16, 16] != sketch dim 64"),
      ex.getMessage)
    // ... and the guard must see the WHOLE frame, not a first-row sample:
    // a mixed-dim corpus whose FIRST vector matches the sketch dim used to
    // slip through, with every other vector silently sketching to 0
    val mixed = (Seq((30L, vec(4))) ++
      Seq((31L, vec(5).take(8)), (32L, vec(6).take(8))))
      .toDF("vec_id", "embedding")
    val exMixed = intercept[IllegalArgumentException] {
      SimilarityOps.embeddingNearDupPairs(mixed,
        threshold = 0.95, maxHamming = 3, dim = 16)
    }
    assert(exMixed.getMessage.contains("dims [8, 16] != sketch dim 16"),
      exMixed.getMessage)
  }

  test("embeddingNearDupPairs: zero vectors are excluded, not a crash or a pair") {
    import spark.implicits._
    // two zero vectors would sketch identically (hash 0) and become a
    // chunk candidate — whose cosine is 0/0, a JOB-KILLING error under
    // ANSI mode (Spark 4 default). The operator excludes zero-magnitude
    // vectors up front (no defined cosine to anything).
    val corpus = Seq(
      (1L, Array.fill(16)(0.0)), (2L, Array.fill(16)(0.0)),
      (3L, Array.tabulate(16)(_.toDouble + 1.0)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.embeddingNearDupPairs(corpus,
      threshold = 0.0, maxHamming = 3, dim = 16).collect()
    assert(got.isEmpty, s"zero-vector pair leaked: ${got.mkString(",")}")
  }

  test("embeddingSketchRecallEval: measured sketch recall on the " +
      "twin-augmented sf0.01 corpus") {
    import spark.implicits._
    // the d18 audit: truth = brute cos>=0.95 pairs, banded = the
    // sketch->chunk->verify miner. Sketch recall is PROBABILISTIC (a true
    // pair at hamming > 3 is missed), so the assertions are structural:
    // precision exactly 1 (cosine-verified candidates), banded ⊆ truth
    // (matched == banded), nonzero truth, and hash-deterministic replay.
    val base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x * lit(1.5)).otherwise(x)).as("embedding"))
    val corpus = base.unionByName(twins)
    val row = SimilarityOps.embeddingSketchRecallEval(corpus,
      threshold = 0.95, maxHamming = 3, sampleRate = 1.0).head()
    assert(row.getAs[Long]("n_sampled") === row.getAs[Long]("n_docs"))
    val truth = row.getAs[Long]("truth_pairs")
    val banded = row.getAs[Long]("banded_pairs")
    assert(truth > 0, "augmented corpus has no cos>=0.95 pairs - vacuous audit")
    assert(row.getAs[Long]("matched_pairs") === banded)
    assert(row.getAs[Long]("precision_ppm") === 1000000L)
    assert(row.getAs[Long]("recall_ppm") ===
      banded * 1000000L / truth) // the ppm grid is the exact int64 ratio
    // planted identical twins sketch identically (hamming 0): raising
    // maxHamming can only add pairs, never lose one
    val row5 = SimilarityOps.embeddingSketchRecallEval(corpus,
      threshold = 0.95, maxHamming = 5, sampleRate = 1.0).head()
    assert(row5.getAs[Long]("banded_pairs") >= banded)
    assert(row5.getAs[Long]("recall_ppm") >= row.getAs[Long]("recall_ppm"))
  }

  test("semDedup: verdict per vector, twins dropped onto their base, " +
      "drop rule is cell-local and deterministic") {
    // the s21 augmentation: near-identical twins (first dim x1.5) planted
    // above 1e6 — cos(base, twin) = (1+0.5r)/sqrt(1+1.25r) >= 0.9806 for
    // any first-dim energy share r, always above the 0.95 threshold
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") * lit(1.5))
            .otherwise(x.cast("double"))).as("embedding"))
    val aug = base.unionByName(twins)
    val n = aug.count()
    val out = SimilarityOps.semDedup(aug, nCells = 16, iters = 2,
      threshold = 0.95).collect()
    assert(out.length === n, "one verdict row per vector")
    val byId = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val twinIds = byId.keys.filter(_ >= 1000000L).toSeq
    assert(twinIds.nonEmpty)
    twinIds.foreach { t =>
      val (tCell, tKept, tDup) = byId(t)
      val (bCell, _, _) = byId(t - 1000000L)
      if (tCell == bCell) {
        assert(!tKept, s"twin $t shares cell $tCell with base but was kept")
        assert(tDup.exists(_ < t), s"twin $t: dup_of must be a lower id")
      }
    }
    // the overwhelming majority of twins land in their base's cell and drop
    val sameCell = twinIds.count(t => byId(t)._1 == byId(t - 1000000L)._1)
    assert(sameCell >= twinIds.size * 9 / 10,
      s"only $sameCell/${twinIds.size} twins share their base's cell")
    // every dropped vector names a lower-id partner; kept rows carry nulls
    out.foreach { r =>
      if (r.getBoolean(2)) assert(r.isNullAt(3) && r.isNullAt(4))
      else assert(r.getLong(3) < r.getLong(0) && !r.isNullAt(4))
    }
    // deterministic: a re-run yields the identical verdict set
    val again = SimilarityOps.semDedup(aug, nCells = 16, iters = 2,
      threshold = 0.95).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("semDedupSampled: every production lever binds (cap, sample, prune), " +
      "no point drops out of assignment, twin recall matches semDedup") {
    val base = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") * lit(1.5))
            .otherwise(x.cast("double"))).as("embedding"))
    val aug = base.unionByName(twins)
    val n = aug.count()
    // the s22 gate constants: cap 8 binds (ceil(n/64) > 8 on this fixture),
    // the 256-row fit sample binds (256 < n), 4 coarse groups prune
    assert(math.ceil(n / 64.0) > 8, "fixture too small - cap would not bind")
    assert(n > 256, "fixture too small - fit sample would not bind")
    val out = SimilarityOps.semDedupSampled(aug, targetCellSize = 64,
      maxCells = 8, iters = 2, threshold = 0.95, fitSampleN = 256,
      coarseGroups = Some(4)).collect()
    // PRUNED assignment must still assign EVERY vector (the non-empty-group
    // restriction is what guarantees this): one verdict row per vector
    assert(out.length === n, "pruned assignment lost vectors")
    // the cap is real: at most maxCells distinct cells in the verdicts
    val cells = out.map(_.getInt(1)).distinct
    assert(cells.length <= 8, s"cap violated: ${cells.length} cells")
    assert(cells.length >= 2, "degenerate single-cell clustering")
    // verdict-shape invariants shared with semDedup
    out.foreach { r =>
      if (r.getBoolean(2)) assert(r.isNullAt(3) && r.isNullAt(4))
      else assert(r.getLong(3) < r.getLong(0) && !r.isNullAt(4))
    }
    // twin recall: cos(base, twin) >= 0.9806 always, so a twin sharing its
    // base's cell MUST drop; with 8 sampled cells the overwhelming majority
    // land together — the sampled/pruned path keeps semDedup's recall
    val byId = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getBoolean(2))).toMap
    val twinIds = byId.keys.filter(_ >= 1000000L).toSeq
    assert(twinIds.nonEmpty)
    twinIds.foreach { t =>
      if (byId(t)._1 == byId(t - 1000000L)._1)
        assert(!byId(t)._2, s"twin $t shares its base's cell but was kept")
    }
    val dropped = twinIds.count(t => !byId(t)._2)
    assert(dropped >= twinIds.size * 9 / 10,
      s"only $dropped/${twinIds.size} twins dropped on the sampled path")
    // deterministic end-to-end (sample membership, group/cell ranks,
    // verdicts are all pure functions of the corpus)
    val again = SimilarityOps.semDedupSampled(aug, targetCellSize = 64,
      maxCells = 8, iters = 2, threshold = 0.95, fitSampleN = 256,
      coarseGroups = Some(4)).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("semDedupSampled fit: the repartitioned (distributed) sample fits a " +
      "BIT-IDENTICAL codebook to a single-partition materialization") {
    // the r16 plan flaw: orderBy+limit plans as a single-partition
    // GlobalLimit, so without a repartition every per-iteration fit
    // aggregate ran on ONE task. The fix redistributes the SAME rows
    // (membership is fixed by the hash order before the repartition);
    // kmeansFit's nano-grid means are exact-long sums — order-independent
    // — so the codebook must not move by even an ulp.
    val corpus = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val sample = corpus
      .select(col("vec_id"), col("embedding"),
        graft.functions.Hashing.hash60(
          concat(lit("sdfit_"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(256)
      .select("vec_id", "embedding")
    val single = sample.coalesce(1)
    val multi = sample.repartition(8, col("vec_id"))
    assert(multi.rdd.getNumPartitions === 8, "fit sample must distribute")
    val init = SimilarityOps.ivfCodebook(spark, nCells = 8, dim = 64)
    val (cbS, _) = SimilarityOps.kmeansFit(single, 8, 2, init = Some(init))
    val (cbM, _) = SimilarityOps.kmeansFit(multi, 8, 2, init = Some(init))
    def anchors(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cell").collect()
        .map(r => (r.get(0), r.getSeq[Double](1).toVector)).toSeq
    assert(anchors(cbS) === anchors(cbM),
      "distributed fit drifted from the single-partition codebook")
  }

  test("artifact search prunes the scan to probed cell partitions " +
      "(static partition filter, not runtime luck)") {
    val ivfCb = SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val path = java.nio.file.Files
      .createTempDirectory("ivfpq_prune_spec").toString
    SimilarityOps.ivfPqIndexWrite(
      SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb), ivfCb, pqCb, path)
    val (index, icb, pcb) = SimilarityOps.ivfPqIndexRead(spark, path)
    val oneQuery = emb.filter(col("vec_id") === 0)
    val served = SimilarityOps.ivfPqTopKFromIndex(index, oneQuery, icb, pcb,
      topK = 5, nProbe = 2)
    // the probed-cell set is pushed as a STATIC IN filter on the index's
    // partition column: the codes scan must carry a PartitionFilters
    // entry on cell — at rest that is file-listing-time pruning, the
    // inverted-list seek
    val planStr = served.queryExecution.executedPlan.toString
    val scanLine = planStr.linesIterator
      .filter(_.contains("PartitionFilters: [")).mkString("\n")
    assert(scanLine.contains("cell"),
      s"no cell partition filter on the codes scan:\n$planStr")
    // and the pruned search returns the same rows as the unpruned join
    val unpruned = SimilarityOps.ivfPqTopKFromIndex(index, oneQuery, icb,
      pcb, topK = 5, nProbe = 2, pruneCells = false)
    assert(served.collect().map(_.toString).toSeq ===
      unpruned.collect().map(_.toString).toSeq)
  }
}
