package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, DedupOps, SimilarityOps, TextOps}

/** End-to-end training-data curation recipe — the composition story for the
  * §2E operator families: one call takes a raw (doc_id, text, source)
  * corpus and a benchmark frame to
  *
  *   1. exact-dedup (case/whitespace fingerprint, keep min id — E1),
  *   2. near-dedup (MinHash-LSH pairs → connected components → best-quality
  *      canonical per cluster — E3/E5b/E91),
  *   3. decontaminate against the benchmark (token k-grams — E30),
  *   4. quality-gate (per-source top quantile, the sketch-threshold scale
  *      path — E17),
  *   5. split exactly (per-source train/val/test — E105), and
  *   6. deal the train split into quality-balanced shards (E115),
  *
  * returning the curated frame plus per-stage survivor counts (the audit
  * numbers a curation run reports). Every stage is individually
  * oracle-gated through its own query key; this job pins the COMPOSITION —
  * stages run in the order a real pipeline runs them, each reading the
  * previous stage's materialized survivors (eager checkpoints: the frames
  * feed both the next stage and a stage-count action, and near-dedup's LSH
  * internals manage their own caches — the d06 lesson).
  *
  * Driver-side work: one count per stage (the audit numbers; bounded) and
  * the union-find/collect internals of the composed operators, each
  * individually bounded as documented at its definition.
  */
object CurationPipeline {

  /** curated: the surviving docs + (split, shard) assignment (shard only
    * on the first split's rows, null elsewhere); stageCounts: survivors
    * after each stage, input first. */
  case class Result(curated: DataFrame, stageCounts: Seq[(String, Long)])

  /** @param embeddings optional (doc_id, embedding) frame keyed like
    *   `docs` — when present, a SEMANTIC near-dup stage (SemDeDup-style)
    *   runs after the lexical one: hyperplane-sketch pair mining over the
    *   SURVIVORS' embeddings (E122's banded plan — no all-pairs), the
    *   E5b/E91 cluster + best-quality-canonical machinery, non-canonical
    *   members dropped. Lexical near-dup catches copies that SHARE text;
    *   the embedding stage catches paraphrases/translations that share
    *   meaning — different recall classes, both real curation stages.
    *   Docs without an embedding row pass through untouched (no embedding
    *   is not evidence of duplication). */
  def run(docs: DataFrame, bench: DataFrame,
          jaccard: Double = 0.8,
          decontamK: Int = 5,
          qualityQuantile: Double = 0.5,
          splits: Seq[(String, Long)] = Seq("train" -> 800000L,
            "val" -> 100000L, "test" -> 100000L),
          nShards: Int = 4,
          embeddings: Option[DataFrame] = None,
          embCosine: Double = 0.95): Result = {
    val n0 = docs.count()
    val qMicro = round(TextOps.qualityScore(col("text")) * lit(1000000.0))
      .cast("long")

    // 1. exact dedup: the fingerprint group's min id survives
    val keepExact = DedupOps.exactDedup(docs, col("doc_id"), col("text"))
      .select(col("keep_id").as("doc_id"))
    val d1 = docs.join(keepExact, "doc_id").localCheckpoint(true)

    // 2. near-dedup: LSH pairs -> components -> best-quality canonical
    val sh = DedupOps.shingleSets(d1, col("doc_id"), col("text"), 3)
    val pairs = DedupOps.minhashLshPairs(sh, jaccard)
    val clusters = DedupOps.dedupClusters(d1.select(col("doc_id")),
      pairs.select("doc_a", "doc_b"))
    val keepNear = DedupOps.canonicalPerCluster(clusters,
        d1.select(col("doc_id"), qMicro.as("q_micro")),
        col("doc_id"), col("q_micro"))
      .filter(col("keep") === 1).select("doc_id")
    val d2 = d1.join(keepNear, "doc_id").localCheckpoint(true)

    // 2b. optional semantic near-dedup over the survivors' embeddings
    val d2b = embeddings match {
      case None => d2
      case Some(emb) =>
        val survEmb = emb.select(col("doc_id"), col("embedding"))
          .join(d2.select(col("doc_id")), "doc_id")
        // sketch dim must MATCH the data (a mismatch fails loudly in the
        // miner — wrong-dim vectors would otherwise all sketch to 0 and
        // degenerate candidates to all-pairs); detect it from one row
        val dim = survEmb.select(size(col("embedding"))).head(1)
          .headOption.map(_.getInt(0)).getOrElse(64)
        val ePairs = SimilarityOps.embeddingNearDupPairs(survEmb,
            threshold = embCosine, dim = dim, idCol = col("doc_id"))
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
        val eClusters = DedupOps.dedupClusters(
          survEmb.select(col("doc_id")), ePairs)
        val dropped = DedupOps.canonicalPerCluster(eClusters,
            d2.select(col("doc_id"), qMicro.as("q_micro")),
            col("doc_id"), col("q_micro"))
          .filter(col("keep") === 0).select("doc_id")
        d2.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint(true)
    }

    // 3. decontamination: drop docs sharing any k-gram with the benchmark
    val contaminated = DedupOps.decontaminate(d2b, col("doc_id"), col("text"),
      bench, col("text"), decontamK)
    val d3 = d2b.join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // 4. quality gate: per-source top quantile, sketch-threshold path
    val qualified = CurationOps.qualityTopQuantile(d3, col("doc_id"),
        col("source"), TextOps.qualityScore(col("text")), qualityQuantile,
        exact = false)
      .select(col("id").as("doc_id"))
    val d4 = d3.join(qualified, "doc_id").localCheckpoint(true)

    // 5. exact split + 6. balanced shards over the first split
    val split = CurationOps.exactSplit(d4, col("doc_id"), col("source"),
      splits)
    val withSplit = d4.join(
      split.select(col("id").as("doc_id"), col("split")), "doc_id")
    val shards = CurationOps.balancedShards(
        withSplit.filter(col("split") === splits.head._1),
        col("doc_id"), col("source"), qMicro, nShards)
      .select(col("id").as("doc_id"), col("shard"))
    val curated = withSplit.join(shards, Seq("doc_id"), "left")

    Result(curated, Seq(
      "input" -> n0,
      "exact_dedup" -> d1.count(),
      "near_dedup" -> d2.count()) ++
      (if (embeddings.isDefined) Seq("embed_dedup" -> d2b.count()) else Nil) ++
      Seq(
        "decontaminated" -> d3.count(),
        "quality" -> d4.count()))
  }
}
