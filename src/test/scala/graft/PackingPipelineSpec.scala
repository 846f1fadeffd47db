package graft

import org.apache.spark.sql.functions._
import graft.jobs.PackingPipeline

/** E126: the tokenize → chunk → pack composition. Each stage is gated on
  * its own (BpeSpec, CurationSpec); this pins that they compose — token
  * conservation end-to-end, chunk/budget invariants on the PACKED output,
  * and bit-identical re-runs. */
class PackingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 40L).map { i =>
    // repeated word stock => the BPE trainer has real pairs to merge
    val words = Seq("banana", "bandana", "cabana", "ana", "nab")
    (i, (0 until (5 + (i % 7)).toInt)
      .map(j => words(((i + j) % words.size).toInt)).mkString(" "))
  }.toDF("doc_id", "text")

  test("packing pipeline: conservation, chunk bounds, budget, determinism") {
    val r = PackingPipeline.run(corpus, col("doc_id"), col("text"),
      numMerges = 8, chunkTokens = 10, budgetTokens = 25, nShards = 2)
    val stats = r.stats.toMap
    assert(stats("docs") === 40L)
    assert(r.merges.nonEmpty && r.merges.size <= 8)
    // conservation: packed token total == total BPE tokens of the corpus
    val directTokens = graft.operators.TextOps
      .applyBpeMerges(corpus, col("doc_id"), col("text"), r.merges)
      .agg(sum(size(col("bpe_tokens")))).collect()(0).getLong(0)
    assert(stats("bpe_tokens") === directTokens)
    val rows = r.packed.collect()
    assert(rows.length === stats("chunks"))
    // every chunk within the chunk size; every pack within the budget
    assert(rows.forall(_.getAs[Int]("n_tokens") <= 10))
    val packTotals = rows.groupBy(x =>
      (x.getAs[Int]("shard"), x.getAs[Long]("pack_id")))
      .view.mapValues(_.map(_.getAs[Int]("n_tokens").toLong).sum)
    // the t11 contract: pack = floor(preceding/budget), so a pack closes
    // when the cumsum CROSSES the budget — totals overhang by at most one
    // chunk (CurationSpec pins the defining invariant; here the bound)
    assert(packTotals.values.forall(_ <= 25L + 9L),
      s"over-overhang pack: ${packTotals.filter(_._2 > 34L).toMap}")
    assert(packTotals.size === stats("packs"))
    // tokenization really merged something: some chunk token is multi-char
    // beyond the raw alphabet (a merge product)
    assert(rows.exists(_.getAs[String]("chunk_text").split(" ")
      .exists(_.length > 1)))
    // deterministic: a re-run reproduces the identical packed assignment
    val again = PackingPipeline.run(corpus, col("doc_id"), col("text"),
      numMerges = 8, chunkTokens = 10, budgetTokens = 25, nShards = 2)
    assert(again.merges === r.merges)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id", "chunk_id", "shard", "pack_id", "n_tokens")
        .collect().map(_.toString).sorted.toSeq
    assert(key(again.packed) === key(r.packed))
  }

  test("packing pipeline: budget must fit a chunk") {
    intercept[IllegalArgumentException] {
      PackingPipeline.run(corpus, col("doc_id"), col("text"),
        numMerges = 2, chunkTokens = 50, budgetTokens = 10, nShards = 2)
    }
  }
}
