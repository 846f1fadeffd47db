package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, TextOps}

/** The tokenize-side composition recipe, beside [[CurationPipeline]]'s
  * curation side: train a BPE tokenizer on the corpus → tokenize it →
  * fixed-length chunks → greedy sequence packing under a token budget
  * across hash-assigned shards — the "turn curated text into training
  * batches" job (E126). Every stage is an individually oracle/spec-gated
  * operator (t36 training, t36-apply tokenization, t07 chunking, t11
  * packing); this job pins that they COMPOSE: BPE token arrays flatten
  * back to a per-document token string in word order, so the chunker's
  * whitespace tokens ARE the BPE tokens, and chunk token counts feed the
  * packer unchanged.
  *
  * Scale shape inherited from the stages: tokenizer training runs on the
  * vocab-sized word table (one corpus scan), the only driver action is
  * the `numMerges`-row merge table, tokenization joins the corpus once,
  * chunking is narrow, packing windows within hash shards. The per-doc
  * regroup (one shuffle) is this job's only addition. */
object PackingPipeline {

  /** packed: (id, chunk_id, chunk_text, n_tokens, shard, pack_id);
    * merges: the learned rank-ordered merge table;
    * stats: bounded corpus-level counters (each one tiny aggregate). */
  case class Result(packed: DataFrame, merges: Seq[(String, String)],
                    stats: Seq[(String, Long)])

  def run(docs: DataFrame, idCol: Column, textCol: Column,
          numMerges: Int = 16, chunkTokens: Int = 128,
          budgetTokens: Int = 512, nShards: Int = 8): Result = {
    require(budgetTokens >= chunkTokens,
      s"budgetTokens ($budgetTokens) must fit a chunk ($chunkTokens) — " +
        "chunks are never split")
    // 1. train: vocab-sized rounds, bounded numMerges-row driver collect
    val merges = TextOps.trainBpeMerges(docs, textCol, numMerges)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // 2. tokenize: vocab-level replace chain + one corpus join
    val tok = TextOps.applyBpeMerges(docs, idCol, textCol, merges)
    // 3. per-doc BPE token string in word order (the one added shuffle);
    //    checkpointed — chunking and stats both read it
    val bpeText = tok.groupBy(col("id"))
      .agg(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("word_pos"), col("bpe_tokens")))),
          x => x.getField("bpe_tokens")))).as("bpe_text"))
      .localCheckpoint(true)
    // 4. fixed-length chunks over BPE tokens; 5. pack under the budget
    val chunks = CurationOps.chunkDocuments(bpeText, col("id"),
      col("bpe_text"), chunkTokens)
    val packed = CurationOps.packChunks(chunks, col("id"), col("chunk_id"),
        col("n_tokens"), budgetTokens, nShards)
      .localCheckpoint(true)
    // ONE aggregate over the checkpointed output (null-safe: an empty or
    // all-filtered corpus yields zeros, not an NPE on the null sum)
    val s = packed.agg(count(lit(1)),
      coalesce(sum(col("n_tokens")), lit(0L)),
      countDistinct(struct(col("shard"), col("pack_id")))).collect()(0)
    Result(packed, merges, Seq(
      "docs" -> docs.count(),
      "bpe_tokens" -> s.getLong(1),
      "chunks" -> s.getLong(0),
      "packs" -> s.getLong(2)))
  }
}
