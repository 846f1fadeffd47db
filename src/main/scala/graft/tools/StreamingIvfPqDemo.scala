package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Streaming IVF-PQ ingestion end-to-end at a real decade (VERDICT r14
  * task 7): s14's shard-append path is proven structurally in
  * StreamingSpec at fixture scale; this main drives a foreachBatch ingest
  * of a decade's embedding corpus into the PERSISTED index artifact and
  * measures, per trigger:
  *
  *   - append wall time (encode the trigger's shard under the FROZEN
  *     codebooks + append its cell-partitioned code rows),
  *   - index growth (code rows on disk after the trigger),
  *   - probe latency + recall@5/MRR of a fixed query panel against the
  *     index AS OF that trigger, scored vs brute exact-cosine truth over
  *     the vectors ingested SO FAR (the honest moving target — streaming
  *     recall is measured against what the index could know).
  *
  * After the last trigger the full index is REBUILT from scratch (same
  * frozen codebooks) and compared row-for-row against the appended
  * artifact, plus search-result-for-search-result on the panel — the
  * append-vs-rebuild equivalence the artifact contract claims
  * (appendable without rebuild, SimilarityOps.scala ivfPqIndexWrite).
  *
  * Codebooks are trained ONCE on the first shard (the production shape:
  * train on day 0, freeze, append forever — s17's trained coarse
  * quantizer chain; re-training would re-shuffle every cell and is a
  * rebuild by definition).
  *
  * Usage: runMain graft.tools.StreamingIvfPqDemo [sfDir] [nShards] [outDir]
  */
object StreamingIvfPqDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val nShards = if (args.length > 1) args(1).toInt else 8
    val path = if (args.length > 2) args(2) else "/tmp/ivfpq_stream_demo"
    val nQueries = 100
    val topK = 5
    val nProbe = 4
    val spark = graft.GraftSession.build("ivfpq-stream-demo")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val emb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val n = emb.count()
    val ids = emb.select(min("vec_id"), max("vec_id")).head()
    val (loId, hiId) = (ids.getLong(0), ids.getLong(1))
    val span = hiId - loId + 1
    // integer DIV, not `/` (Spark's / is fractional division — an === on
    // it matches only the exact-0 row, which is how the first cut of this
    // demo shipped an 8-row index and the equivalence check caught it)
    def shardOf = expr(
      s"CAST(((vec_id - ${loId}L) * $nShards) DIV ${span}L AS INT)")
    println(s"[ivfpq-stream] dir=$dir n=$n shards=$nShards -> $path")

    // frozen codebooks, trained on shard 0 (the day-0 corpus)
    val shard0 = emb.filter(shardOf === 0)
    val (ivfCb0, _) = SimilarityOps.kmeansFit(shard0, nCells = 16, iters = 2,
      init = Some(SimilarityOps.ivfCodebook(spark, nCells = 16, dim = 64)))
    val ivfCb = ivfCb0.localCheckpoint(true)
    val pqCb = SimilarityOps.pqCodebook(spark, m = 8, k = 16, dim = 64)
      .localCheckpoint(true)

    // fixed query panel: every (n/nQueries)-th EXISTING row in vec_id
    // order — spread across the id range so later triggers' neighborhoods
    // are represented too (the single-partition window is demo-sized)
    val stride = math.max(1L, n / nQueries)
    // (rn - 1) % stride == 0, NOT rn % stride == 1: identical picks for
    // stride > 1 (rn = 1, stride+1, ...), but at stride = 1 — a corpus
    // smaller than 2×nQueries — rn % 1 is always 0 and the old predicate
    // selected NOTHING, so recallProbe averaged over zero rows and NPE'd
    val queries = emb
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")))
      .filter((col("__rn") - 1) % stride === 0).limit(nQueries)
      .drop("__rn").localCheckpoint(true)

    def recallProbe(upToShard: Int): (Double, Double, Double) = {
      val (codes, icb, pcb) = SimilarityOps.ivfPqIndexRead(spark, path)
      val t0 = System.nanoTime()
      val res = SimilarityOps.ivfPqTopKFromIndex(codes, queries, icb, pcb,
        topK = topK, nProbe = nProbe).localCheckpoint(true)
      val probeSec = (System.nanoTime() - t0) / 1e9
      val seen = emb.filter(shardOf <= upToShard)
      val truth = SimilarityOps.bruteForceTopK(seen, queries, k = topK)
      val m = SimilarityOps.annEvalMetrics(res, truth)
        .agg(avg(col("recall_ppm") / 1e6), avg(col("rr_ppm") / 1e6)).head()
      (probeSec, m.getDouble(0), m.getDouble(1))
    }

    // shard 0 seeds the artifact (overwrite: codebooks land beside codes)
    val idx0 = SimilarityOps.ivfPqIndex(shard0, ivfCb, pqCb)
    SimilarityOps.ivfPqIndexWrite(idx0, ivfCb, pqCb, path, append = false)

    val mem = MemoryStream[Int]
    val q = mem.toDS().toDF("shard").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val shards = batch.collect().map(_.getInt(0))
        shards.foreach { s =>
          val rows = emb.filter(shardOf === s)
          val idx = SimilarityOps.ivfPqIndex(rows, ivfCb, pqCb)
          SimilarityOps.ivfPqIndexWrite(idx, ivfCb, pqCb, path, append = true)
        }
      }.start()
    try {
      (1 until nShards).foreach { s =>
        val t0 = System.nanoTime()
        mem.addData(s)
        q.processAllAvailable()
        val appendSec = (System.nanoTime() - t0) / 1e9
        val indexRows = spark.read.parquet(s"$path/codes").count()
        val (probeSec, recall, mrr) = recallProbe(s)
        println(f"[ivfpq-stream] trigger=$s%2d append=${appendSec}%6.1f s" +
          f"  index_rows=$indexRows%,12d  probe=${probeSec}%5.1f s" +
          f"  recall@$topK=${recall}%.3f  mrr=${mrr}%.3f")
      }
    } finally q.stop()

    // append-vs-rebuild equivalence: same frozen codebooks, one batch build
    val rebuilt = SimilarityOps.ivfPqIndex(emb, ivfCb, pqCb)
    val appended = spark.read.parquet(s"$path/codes")
      .select("vec_id", "sub", "code", "cell")
    val diff = rebuilt.exceptAll(appended).count() +
      appended.exceptAll(rebuilt).count()
    val rebuiltPath = s"$path-rebuilt"
    SimilarityOps.ivfPqIndexWrite(rebuilt, ivfCb, pqCb, rebuiltPath)
    val (rc, ricb, rpcb) = SimilarityOps.ivfPqIndexRead(spark, rebuiltPath)
    val sAppend = SimilarityOps.ivfPqTopKFromIndex(
      spark.read.parquet(s"$path/codes"), queries, ivfCb, pqCb, topK, nProbe)
    val sRebuild = SimilarityOps.ivfPqTopKFromIndex(rc, queries, ricb, rpcb,
      topK, nProbe)
    val searchDiff = sAppend.exceptAll(sRebuild).count() +
      sRebuild.exceptAll(sAppend).count()
    println(s"[ivfpq-stream] append-vs-rebuild: code-row diff = $diff, " +
      s"search-result diff = $searchDiff " +
      (if (diff == 0 && searchDiff == 0) "(EQUIVALENT)" else "(MISMATCH!)"))
    spark.stop()
    if (diff != 0 || searchDiff != 0) sys.exit(1)
  }
}
