package graft

import org.apache.spark.sql.functions._
import graft.jobs.CurationPipeline

/** The composition gate for the curation recipe: each stage is
  * oracle-checked on its own; this pins that the STAGES COMPOSE — planted
  * exact dups, near dups, and contaminated docs fall out at the right
  * stage, and the survivors carry a complete, deterministic
  * split/shard assignment. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // filler docs so every source has enough rows to split
    val filler = (100L until 140L).map { i =>
      (i, s"filler document number $i with some distinct words w$i x$i y$i z$i q$i r$i", s"s${i % 2}")
    }
    (Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight", "s0"),
      (2L, "THE  QUICK   brown fox jumps over the lazy dog tonight", "s0"), // exact dup of 1 mod case/ws
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "s1"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu", "s1"), // near dup of 3
      (5L, "leaked benchmark question about spark shuffles appears verbatim here", "s0")
    ) ++ filler).toDF("doc_id", "text", "source")
  }

  private val bench =
    Seq((900L, "a leaked benchmark question about spark shuffles and more"))
      .toDF("bench_id", "text")

  test("stages compose: dups and contamination fall out, survivors fully assigned") {
    val r = CurationPipeline.run(corpus, bench, qualityQuantile = 1.0,
      nShards = 2)
    val counts = r.stageCounts.toMap
    assert(counts("input") === 45L)
    assert(counts("exact_dedup") === 44L)     // 2 merged into 1
    assert(counts("near_dedup") === 43L)      // one of 3/4 survives
    assert(counts("decontaminated") === 42L)  // 5 shares a 5-gram with bench
    assert(counts("quality") === 42L)         // q = 1.0 keeps everything
    val rows = r.curated.collect()
    assert(rows.length === 42)
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(5L))
    assert(Seq(3L, 4L).count(ids.contains) === 1) // exactly one near-dup kept
    // every survivor has a split; every train row has a shard in range
    val splitIdx = r.curated.columns.indexOf("split")
    val shardIdx = r.curated.columns.indexOf("shard")
    assert(rows.forall(!_.isNullAt(splitIdx)))
    val train = rows.filter(_.getString(splitIdx) == "train")
    assert(train.nonEmpty &&
      train.forall(r => !r.isNullAt(shardIdx) && Set(0, 1)(r.getInt(shardIdx))))
    assert(rows.filterNot(_.getString(splitIdx) == "train")
      .forall(_.isNullAt(shardIdx)))
    // deterministic: a second run reproduces the identical assignment
    val again = CurationPipeline.run(corpus, bench, qualityQuantile = 1.0,
      nShards = 2)
    assert(again.curated.orderBy("doc_id").collect().map(_.toString).toSeq ===
      r.curated.orderBy("doc_id").collect().map(_.toString).toSeq)
  }

  test("optional semantic stage: paraphrase-by-embedding drops, no-embedding docs pass") {
    // docs 10/11 share NO text (lexical stages keep both) but carry
    // near-identical embeddings — the semantic stage must collapse them
    // to the better-quality member; docs without embedding rows (the
    // whole filler set) pass through untouched
    def vec(seed: Int): Array[Double] = Array.tabulate(16) { d =>
      ((graft.functions.Hashing.hash60Scalar(s"cpe_${seed}_$d") % 2001) - 1000) / 1000.0
    }
    val docs2 = corpus.unionByName(Seq(
      (10L, "completely original prose about gardening and long walks outside", "s0"),
      (11L, "unrelated words entirely discussing mountains rivers and weather maps", "s0"))
      .toDF("doc_id", "text", "source"))
    val perturbed = { val v = vec(1); v(0) *= 1.1; v }
    val emb = Seq((10L, vec(1)), (11L, perturbed), (3L, vec(7)))
      .toDF("doc_id", "embedding")
    val r = CurationPipeline.run(docs2, bench, qualityQuantile = 1.0,
      nShards = 2, embeddings = Some(emb))
    val counts = r.stageCounts.toMap
    assert(counts("near_dedup") === 45L)  // lexical stages see no 10/11 dup
    assert(counts("embed_dedup") === 44L) // the semantic stage does
    val ids = r.curated.collect().map(_.getLong(0)).toSet
    assert(Seq(10L, 11L).count(ids.contains) === 1,
      s"semantic pair not collapsed: $ids")
    // without embeddings the stage is absent and nothing else changes
    val r0 = CurationPipeline.run(docs2, bench, qualityQuantile = 1.0,
      nShards = 2)
    assert(!r0.stageCounts.exists(_._1 == "embed_dedup"))
    val ids0 = r0.curated.collect().map(_.getLong(0)).toSet
    assert(ids0.contains(10L) && ids0.contains(11L))
  }

  test("quality gate engages below q = 1.0 and only ever shrinks the corpus") {
    val r = CurationPipeline.run(corpus, bench, qualityQuantile = 0.5,
      nShards = 2)
    val counts = r.stageCounts.toMap
    assert(counts("quality") < counts("decontaminated"))
    assert(r.curated.count() === counts("quality"))
  }
}
