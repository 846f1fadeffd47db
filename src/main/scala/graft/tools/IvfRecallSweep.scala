package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Trained-vs-untrained COARSE QUANTIZER recall sweep (VERDICT r12 task 2):
  * recall@5 / MRR against brute exact-cosine truth for the two production
  * search shapes — one-stage ADC (the s13 key) and two-stage shortlist +
  * exact re-rank (the s16 key) — under the hash ±1 IVF codebook vs the
  * same codebook refined by N oracle-replayable nano-grid Lloyd iterations
  * (the s12/s17 chain). PQ codes stay hash-derived in all four cells of
  * the grid: PQ training moves reconstruction MSE, not ranking (measured,
  * SCALING r12), so holding codes fixed isolates what training the CELLS
  * buys — which is cell-probe recall, the one term the re-rank cannot buy
  * back.
  *
  * Usage: runMain graft.tools.IvfRecallSweep <sfDir> [nCells] [nProbe]
  * [iters] [nQueries]. Prints one JSON line per configuration.
  */
object IvfRecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nCells = if (args.length > 1) args(1).toInt else 16
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val iters = if (args.length > 3) args(3).toInt else 2
    val nQueries = if (args.length > 4) args(4).toInt else 100
    val spark = graft.GraftSession.build("graft-ivf-recall-sweep")
    spark.sparkContext.setLogLevel("WARN")
    // float element contract (the AnnTrainSweep normalization note)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("float")).as("embedding"))
      .localCheckpoint(true)
    val q = emb.filter(col("vec_id") < nQueries).localCheckpoint(true)
    val n = emb.count()
    println(s"""[ivfsweep] {"sf":"$sfDir","vectors":$n,"queries":${q.count()},"nCells":$nCells,"nProbe":$nProbe,"iters":$iters}""")

    val truth = SimilarityOps.bruteForceTopK(emb, q, k = 5).localCheckpoint(true)
    val hashIvf = SimilarityOps.ivfCodebook(spark, nCells, dim = 64)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
    val encoded = SimilarityOps.pqEncode(emb, pqCb).localCheckpoint(true)

    def metrics(result: DataFrame): (Double, Double) = {
      val m = SimilarityOps.annEvalMetrics(result, truth)
        .agg(avg(col("recall_ppm") / 1e6), avg(col("rr_ppm") / 1e6))
        .head()
      (m.getDouble(0), m.getDouble(1))
    }

    def report(tag: String, ivfCb: DataFrame): Unit = {
      val assigned = SimilarityOps.ivfAssign(emb, ivfCb)
        .select("vec_id", "cell").localCheckpoint(true)
      val t0 = System.nanoTime()
      val (adcRecall, adcMrr) = metrics(SimilarityOps.ivfPqTopK(
        encoded, assigned, q, ivfCb, pqCb, topK = 5, nProbe = nProbe))
      val t1 = System.nanoTime()
      val index = assigned.join(encoded, "vec_id")
        .select("vec_id", "sub", "code", "cell")
      val (rrRecall, rrMrr) = metrics(SimilarityOps.ivfPqTopKReranked(
        index, emb, q, ivfCb, pqCb, topK = 5, shortlistR = 20,
        nProbe = nProbe))
      val t2 = System.nanoTime()
      // residual encoding (the s19 config): codes quantize x − μ_cell,
      // one-stage ADC over the reconstruction dot(q, μ + α·anchor)
      val (resIndex, resScales) =
        SimilarityOps.ivfPqResidualIndex(emb, ivfCb, pqCb)
      val (resRecall, resMrr) = metrics(SimilarityOps.ivfPqResidualTopK(
        resIndex, resScales, q, ivfCb, pqCb, topK = 5, nProbe = nProbe))
      val t3 = System.nanoTime()
      println(f"""[ivfsweep] {"ivf":"$tag","adc_recall5":$adcRecall%.4f,"adc_mrr":$adcMrr%.4f,"rerank_recall5":$rrRecall%.4f,"rerank_mrr":$rrMrr%.4f,"residual_recall5":$resRecall%.4f,"residual_mrr":$resMrr%.4f,"adc_sec":${(t1 - t0) / 1e9}%.2f,"rerank_sec":${(t2 - t1) / 1e9}%.2f,"residual_sec":${(t3 - t2) / 1e9}%.2f}""")
    }

    report("hash", hashIvf)
    val tTrain0 = System.nanoTime()
    val (trainedIvf, _) = SimilarityOps.kmeansFit(emb, nCells, iters,
      init = Some(hashIvf))
    val trainedPinned = trainedIvf.localCheckpoint(true)
    trainedPinned.count()
    println(f"""[ivfsweep] {"train_sec":${(System.nanoTime() - tTrain0) / 1e9}%.2f,"cells_surviving":${trainedPinned.count()}}""")
    report("trained", trainedPinned)
    spark.stop()
  }
}
