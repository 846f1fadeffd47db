package graft.tools

import org.apache.spark.sql.functions._

/** End-to-end packing-pipeline run at an arbitrary sf dir — the recipe had
  * only ever run on spec fixtures, and every real trap in this build's
  * history (lazy-persist races, BNLJ parallelism, generate-filter
  * inlining) surfaced under scale sweeps, not plan reads. Beyond timing,
  * re-asserts the PackingPipelineSpec invariants AT SCALE, where
  * composition traps actually show:
  *  - token conservation: Σ n_tokens over packed chunks == the corpus's
  *    direct BPE token count (an independent tokenization pass with the
  *    same learned merges);
  *  - chunk bound: no chunk exceeds chunkTokens;
  *  - overhang bound: no (shard, pack) exceeds budgetTokens + chunkTokens
  *    − 1 (the t11 contract: the chunk that crosses the budget stays in
  *    the pack it started in; the first sf0.1 run of this sweep measured
  *    the bound EXACTLY tight — 639 = 512 + 128 − 1).
  *
  * Usage: runMain graft.tools.PackingSweep <sfDir> */
object PackingSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("graft-packing-sweep")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val r = graft.jobs.PackingPipeline.run(docs, col("doc_id"), col("text"))
    val elapsed = (System.nanoTime() - t0) / 1e9
    val stats = r.stats.toMap
    // invariants at scale (outside the timed window — they are the
    // sweep's trap detectors, not part of the recipe)
    val direct = graft.operators.TextOps
      .applyBpeMerges(docs, col("doc_id"), col("text"), r.merges)
      .agg(coalesce(sum(size(col("bpe_tokens"))), lit(0L))).head().getLong(0)
    val bounds = r.packed
      .groupBy(col("shard"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("pack_tokens"), max(col("n_tokens")).as("max_chunk"))
      .agg(max(col("pack_tokens")).cast("long"),
        max(col("max_chunk")).cast("long")).head()
    val conserved = stats("bpe_tokens") == direct
    val chunkOk = bounds.getLong(1) <= 128
    val budgetOk = bounds.getLong(0) <= 512 + 128 - 1
    val statsJson = r.stats.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"packing_pipeline","value":$elapsed%.3f,"unit":"sec","stats":$statsJson,"token_conservation":$conserved,"direct_tokens":$direct,"max_pack_tokens":${bounds.getLong(0)},"max_chunk_tokens":${bounds.getLong(1)},"chunk_bound_ok":$chunkOk,"budget_bound_ok":$budgetOk,"sf":"$sfDir"}""")
    require(conserved && chunkOk && budgetOk,
      "packing invariant violated at scale - see JSON line above")
    spark.stop()
  }
}
